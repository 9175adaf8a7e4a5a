package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization probe: split an ingest chain's wall time into the
  * SINK-BODY cost (the per-batch fold work, driven directly) and the
  * STREAMING-RUNTIME overhead (query start, offset/commit logs, file
  * listing, trigger loop) — by running the same batches through
  * [[graft.streaming.StreamOps.applyIngestBatch]] WITHOUT the
  * micro-batch engine and comparing against the registered chain.
  */
object ChainDecompose {
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
    args.collect { case c if c.startsWith("conf:") =>
      val Array(k, v) = c.stripPrefix("conf:").split("=", 2)
      spark.conf.set(k, v); println(s"[decomp] conf $k=$v")
    }

    val fns = graft.SparkEntry.queries
    def time(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decomp] $tag%-28s ${sec}%.3f s")
      sec
    }

    // warm everything once (memo builds, codegen, split files)
    fns("q_stream_dedup_ingest")(spark, sfDir).count()

    val so = graft.streaming.StreamOps
    val src = so.docsSplit(spark, sfDir)
    val corpusSh = graft.dedup.Dedup.corpusShingles(spark, sfDir)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.graft.streamStatePartitions", "8"))

    // batch frames straight off the split files, in slice order
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(src), spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .map(_.getPath.toString).filter(_.contains("docs_")).sorted

    (1 to 2).foreach { round =>
      val state = s"/tmp/graft_decomp_state_${java.util.UUID.randomUUID()}"
      val verd = s"/tmp/graft_decomp_verd_${java.util.UUID.randomUUID()}"
      time(s"seed-v0 (round $round)") {
        graft.dedup.Dedup.corpusBands(spark, sfDir)
          .filter(!Seq(0L, 5L, 3L, 8L).map(m =>
            pmod(col("doc_id"), lit(10L)) === m).reduce(_ || _))
          .write.mode("overwrite").parquet(s"$state/v=0")
      }
      var sinkSum = 0.0
      files.zipWithIndex.foreach { case (f, i) =>
        sinkSum += time(s"applyIngestBatch b=$i (round $round)") {
          so.applyIngestBatch(spark.read.parquet(f), i.toLong,
            state, verd, corpusSh)
        }
      }
      println(f"[decomp] sink-bodies total (round $round): $sinkSum%.3f s")
      fs.delete(new org.apache.hadoop.fs.Path(state), true)
      fs.delete(new org.apache.hadoop.fs.Path(verd), true)
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)

    // the registered chain (streaming runtime included), twice
    (1 to 2).foreach { r =>
      time(s"full chain (run $r)") {
        fns("q_stream_dedup_ingest")(spark, sfDir).count(); ()
      }
    }

    // step-timed copy of applyIngestBatch's body, to see where one
    // batch's ~1.4 s goes (plan+run split per action)
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.graft.streamStatePartitions", "8"))
    locally {
      val state = s"/tmp/graft_decomp2_state_${java.util.UUID.randomUUID()}"
      val verd = s"/tmp/graft_decomp2_verd_${java.util.UUID.randomUUID()}"
      graft.dedup.Dedup.corpusBands(spark, sfDir)
        .filter(!Seq(0L, 5L, 3L, 8L).map(m =>
          pmod(col("doc_id"), lit(10L)) === m).reduce(_ || _))
        .write.mode("overwrite").parquet(s"$state/v=0")
      files.zipWithIndex.foreach { case (f, i) =>
        println(s"---- batch $i steps ----")
        val batch = spark.read.parquet(f)
        var bsh: org.apache.spark.sql.DataFrame = null
        time(s"b=$i shingles+ckpt(lazy)") {
          bsh = graft.functions.TextHash
            .addShingleHashes(batch, col("text")).select("doc_id", "hs")
            .localCheckpoint(false)
        }
        val bands = graft.dedup.Dedup.lshBands(bsh)
          .select("doc_id", "band", "key")
        val index = spark.read.parquet(s"$state/v=$i")
        var verdicts: org.apache.spark.sql.DataFrame = null
        time(s"b=$i screen-plan+ckpt(lazy)") {
          verdicts = graft.dedup.Dedup.screenBatch(
            batch.select("doc_id"), bands, index, bsh, corpusSh)
            .localCheckpoint(false)
        }
        time(s"b=$i ledger-write") {
          verdicts.withColumn("batch", lit(i.toLong))
            .write.mode("overwrite").parquet(s"$verd/b=$i")
        }
        time(s"b=$i fold-write") {
          val survivors = verdicts.filter(!col("is_dup")).select("doc_id")
          index.unionByName(
              bands.join(survivors, Seq("doc_id"), "left_semi"))
            .write.mode("overwrite").parquet(s"$state/v=${i + 1}")
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(state), true)
      fs.delete(new org.apache.hadoop.fs.Path(verd), true)
    }
    spark.stop()
  }
}
