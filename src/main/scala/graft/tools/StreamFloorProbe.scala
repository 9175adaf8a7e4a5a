package graft.tools

import org.apache.spark.sql.SparkSession

/** r14 optimization probe: how much of an ingest chain's bench time is
  * irreducible micro-batch machinery? Runs a NO-OP foreachBatch chain
  * (same 4-file source shape, same checkpoint discipline as
  * runVersionedStream) and a count-only sink chain, then times the real
  * dedup ingest chain body via its registered query for comparison.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fns = graft.SparkEntry.queries
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $tag ms=${(System.nanoTime() - t0) / 1e6}%.1f")
    }

    // materialize a 4-file source like the ingest chains use
    val src = s"/tmp/graft_floor_src_${java.util.UUID.randomUUID()}"
    val docs = graft.io.Tables.load(spark, sfDir, "documents")
    (0 until 4).foreach { i =>
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/f=$i")
    }
    // flatten: the file source streams a directory of files
    val flat = s"/tmp/graft_floor_flat_${java.util.UUID.randomUUID()}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    (0 until 4).foreach { i =>
      val dir = new org.apache.hadoop.fs.Path(s"$src/f=$i")
      val f = fs.listStatus(dir).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.rename(f, new org.apache.hadoop.fs.Path(s"$flat/part-$i.parquet"))
    }

    val schema = spark.read.parquet(flat).schema
    def runNoop(tag: String, work: org.apache.spark.sql.DataFrame => Unit)
        : Unit = {
      val ckpt = s"/tmp/graft_floor_ckpt_${java.util.UUID.randomUUID()}"
      time(tag) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(flat)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
            work(b))
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    }
    // 2 passes each: second shows warm machinery
    runNoop("noop-1", _ => ())
    runNoop("noop-2", _ => ())
    runNoop("count-1", b => { b.count(); () })
    runNoop("count-2", b => { b.count(); () })

    // the real chain for comparison (warm + timed, like Bench)
    fns("q_stream_dedup_ingest")(spark, sfDir).count()
    time("dedup_ingest-timed") {
      fns("q_stream_dedup_ingest")(spark, sfDir).count(); ()
    }
    time("retune_ingest-timed") {
      fns("q_stream_retune_ingest")(spark, sfDir).count(); ()
    }
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(flat), true)
    spark.stop()
  }
}
