package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of named queries
  * (all of them with no args) against sf0.001 — the scale-review loop
  * ("is this the plan I'd want at 100 TB?"). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.registry.map(_.name)
      else args.toSeq
    val fns = SparkEntry.queries
    wanted.foreach { n =>
      println(s"\n===== $n =====")
      fns(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
