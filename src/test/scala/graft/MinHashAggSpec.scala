package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashAgg, TextHash}
import graft.io.Tables

/** The incremental MinHash aggregator must produce the same signatures as
  * the array-expression form, including under repartitioning (partial
  * buffers merge by element-wise min). */
class MinHashAggSpec extends SparkSpec {

  test("aggregator signature equals array-expression signature") {
    val sh = TextHash.addShingleHashes(
      Tables.load(spark, sf001, "documents"), col("text"))
      .select(col("doc_id"), col("hs"))
    val viaArray = sh.select(col("doc_id"),
      array((0 until TextHash.K).map(k =>
        TextHash.minhash(col("hs"), k)): _*).as("sig"))
    val viaAgg = sh
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .repartition(13) // exercise partial-buffer merges
      .groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("h")).as("sig"))
    val joined = viaArray.as("a")
      .join(viaAgg.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.sig") =!= col("b.sig"))
    assert(joined.count() == 0)
    assert(viaAgg.count() == viaArray.count())
  }
}
