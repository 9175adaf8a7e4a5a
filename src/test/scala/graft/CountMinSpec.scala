package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMinAgg, TextHash}

/** Count-min sketch properties: estimates dominate true counts, and the
  * sketch is invariant under repartitioning (element-wise-sum merge). */
class CountMinSpec extends SparkSpec {

  private def tokenHashes = graft.io.Tables.load(spark, sf001, "documents")
    .select(explode_outer(TextHash.tokens(col("text"))).as("token"))
    .filter(col("token").isNotNull)
    .select(col("token"), TextHash.hash32(col("token")).as("h"))

  test("estimate >= exact count for every distinct token") {
    val th = tokenHashes
    val sk = th.agg(CountMinAgg.sketch(col("h")).as("sk"))
    val checked = th.groupBy("token", "h")
      .agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("token"), col("exact"),
        CountMinAgg.estimate(col("sk"), col("h")).as("est"))
    assert(checked.filter(col("est") < col("exact")).count() == 0)
    // the sketch is lossy by construction at W=32: at least one token
    // must actually overestimate, or the collision path is untested
    assert(checked.filter(col("est") > col("exact")).count() > 0)
  }

  test("sketch is identical under repartitioning (mergeable sum)") {
    import spark.implicits._
    val th = tokenHashes
    val a = th.agg(CountMinAgg.sketch(col("h")))
      .as[Seq[Long]].head()
    val b = th.repartition(17, col("token"))
      .agg(CountMinAgg.sketch(col("h")))
      .as[Seq[Long]].head()
    assert(a == b)
    assert(a.sum == th.count() * CountMinAgg.D)
  }
}
