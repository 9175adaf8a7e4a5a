package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** The distributed prefix-sum behind q_pack_chunks (round-2 verdict #2):
  * correctness vs the single-window truth on a worst-case skewed input
  * (one language owns every row), and the parallelism property the rewrite
  * exists for — the dominant language's rows span many range slices
  * instead of funneling through one per-language reducer. */
class PackChunksSpec extends SparkSpec {

  // one dominant language (90% en): the shape that capped the old
  // Window.partitionBy(lang) plan at one reducer for most of the corpus
  private def skewed = spark.range(0, 5000)
    .select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, "fr").otherwise("en").as("lang"),
      (col("id") % 97 + 1).cast("long").as("n_tokens"))

  test("prefix-sum packing equals the single-window truth on skewed input") {
    import spark.implicits._
    val got = TextOps.packByPrefixSum(skewed, slices = Some(8))
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = skewed
      .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"),
        floor(col("prior") / 512.0).cast("long").as("pack_id"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 5000)
    assert(got == want)
  }

  test("parallelism is not bounded by #languages: one lang spans >1 slice") {
    val maxSlices = skewed
      .repartitionByRange(8, col("lang"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .groupBy("lang").agg(countDistinct("pid").as("k"))
      .agg(max("k")).head.getLong(0)
    assert(maxSlices > 1,
      s"dominant language's rows landed in $maxSlices slice(s)")
  }

  test("multi-language interleaving still yields per-lang doc_id order") {
    import spark.implicits._
    val mixed = spark.range(0, 3000)
      .select(col("id").as("doc_id"),
        concat(lit("l"), col("id") % 3).as("lang"),
        (col("id") % 53 + 1).cast("long").as("n_tokens"))
    val got = TextOps.packByPrefixSum(mixed)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = mixed
      .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"),
        floor(col("prior") / 512.0).cast("long").as("pack_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
