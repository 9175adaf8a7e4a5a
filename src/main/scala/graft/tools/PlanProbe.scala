package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan inspector: prints the formatted physical plan of the
  * named registered queries at the given sf dir (default sf0.01). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty && args.head.startsWith("/")) args.head
      else "/root/testdata/sf0.01"
    val names = args.filterNot(_.startsWith("/"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    names.foreach { n =>
      println(s"==== $n ====")
      fns(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
