package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * on SPARK_GRAFT_SF_DIR.
  *
  * Methodology: one untimed warmup execution per query (JIT + codegen +
  * broadcast-pool warmup — measuring engine throughput, not JVM startup),
  * then one timed execution counted via `df.count()`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) SparkEntry.registry.map(_.name).filter(args.contains)
      else SparkEntry.registry.map(_.name)
    val fns = SparkEntry.queries
    names.foreach { n => // warmup
      try fns(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val results = names.map { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fns(n)(spark, sfDir).count()
        catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> times(1) // median of 3 — stable against scheduler noise
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
