package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg
import graft.text.TextOps

/** The Misra–Gries guarantee behind q_heavy_hitters' exact two-pass
  * answer: membership of every > N/(k+1) token in the merged summary,
  * bounded summary size, partition-invariance (the merge path), and the
  * full query against a brute-force ground truth. */
class MisraGriesSpec extends SparkSpec {

  test("summary keeps every token above N/(k+1) under adversarial " +
    "partitioning") {
    import spark.implicits._
    // N = 1200: "hot" occurs 130 > 1200/9 ≈ 133? no — use k = 8, so the
    // threshold is N/9 = 133.3; "hot" at 140 must survive among 106
    // distinct decoys that keep evicting tracked tokens
    val decoys = (0 until 1060).map(i => s"d${i % 106}")
    val stream = (0 until 140).map(_ => "hot") ++ decoys
    val n = stream.size
    val k = 8
    for (parts <- Seq(1, 3, 13)) {
      val df = stream.toDF("tok").repartition(parts)
      val m = df.agg(MisraGriesAgg.summary(col("tok"), k).as("m"))
        .collect()(0).getMap[String, Long](0)
      assert(m.size <= k, s"parts=$parts size=${m.size}")
      assert(140 * (k + 1) > n) // the premise of the guarantee
      assert(m.contains("hot"), s"parts=$parts lost the heavy hitter: $m")
    }
  }

  test("q_heavy_hitters equals the brute-force frequency filter") {
    val got = TextOps.qHeavyHitters.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val toks = graft.io.Tables.load(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val truth = toks.groupBy("tok").count()
      .filter(col("count") * (TextOps.HhK + 1) > n)
      .orderBy(desc("count"), asc("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == truth, s"got $got truth $truth")
  }

  test("summary never exceeds capacity k even when vocab is larger") {
    import spark.implicits._
    val stream = (0 until 5000).map(i => s"t${i % 400}")
    val m = stream.toDF("tok").repartition(7)
      .agg(MisraGriesAgg.summary(col("tok"), 16).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m.size <= 16)
  }
}
