package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** The distributed global rank behind q_global_rank: agreement with the
  * single-window truth, and the fan-out property the two-level scan
  * exists for — rows span many range slices instead of one global-sort
  * partition. */
class GlobalRankSpec extends SparkSpec {

  // non-unique sort values (id % 211) force the unique doc_id tiebreak
  // to do its job across slice boundaries
  private def rows = spark.range(0, 5000)
    .select(col("id").as("doc_id"),
      (col("id") % 211).cast("long").as("score"))

  test("range-sliced rank equals the single-window truth") {
    import spark.implicits._
    val got = TextOps.globalRankByRange(rows,
        Seq(col("score").desc, col("doc_id").asc), slices = Some(8))
      .select("doc_id", "rnk").as[(Long, Long)].collect().toMap
    val want = rows
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))).cast("long"))
      .select("doc_id", "rnk").as[(Long, Long)].collect().toMap
    assert(got.size == 5000)
    assert(got == want)
  }

  test("n_total matches the row count on every row") {
    val out = TextOps.globalRankByRange(rows,
      Seq(col("score").asc, col("doc_id").asc), slices = Some(8))
    assert(out.filter(col("n_total") =!= 5000L).count() == 0)
  }

  test("rows fan out over >1 range slice (no single-partition sort)") {
    val slices = rows
      .repartitionByRange(8, col("score").desc, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
      .agg(countDistinct("pid")).head.getLong(0)
    assert(slices > 1, s"rows landed in $slices slice(s)")
  }
}
