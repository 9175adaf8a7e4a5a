package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of named queries
  * (all of them with no args) against sf0.001 — the scale-review loop
  * ("is this the plan I'd want at 100 TB?").
  *
  * With SPARK_GRAFT_PLAN_DIR set, each query's formatted plan is ALSO
  * written to `$SPARK_GRAFT_PLAN_DIR/<name><SPARK_GRAFT_PLAN_SUFFIX>.txt`
  * (suffix defaults to empty) — the r14 optimization round commits
  * before/after plan files under plans/r14/ as evidence. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
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
      val df = fns(n)(spark, sfDir)
      df.explain("formatted")
      planDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(p.resolve(s"$n$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
