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

  test("grouped rank equals the per-group window truth, fat groups " +
    "spanning slices") {
    import spark.implicits._
    // TWO fat groups over 5000 rows and 8 slices: each group must span
    // several slices (the whole point vs. a bare PARTITION BY group),
    // with duplicate scores forcing the tiebreak across boundaries
    val grouped = spark.range(0, 5000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "even").otherwise("odd").as("grp"),
        (col("id") % 211).cast("long").as("score"))
    val got = TextOps.groupedRankByRange(grouped, Seq("grp"),
        Seq(col("score").asc, col("doc_id").asc), slices = Some(8))
      .select(col("grp"), col("doc_id"), col("rnk"), col("n_group"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = grouped
      .withColumn("rnk", row_number().over(Window.partitionBy("grp")
        .orderBy(asc("score"), asc("doc_id"))).cast("long"))
      .withColumn("n_group", count(lit(1))
        .over(Window.partitionBy("grp")).cast("long"))
      .collect().map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 5000)
    assert(got == want)
    // and each group genuinely spans > 1 slice under the range keys
    val span = grouped
      .repartitionByRange(8, col("grp").asc, col("score").asc,
        col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
      .groupBy("grp").agg(countDistinct("pid").as("n_slices"))
      .agg(min("n_slices")).head.getLong(0)
    assert(span > 1, s"a group sat in $span slice(s)")
  }
}
