package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The optimizer rule that rewrites a global row_number + `rn <= k`
  * filter into Sort+Limit (TakeOrderedAndProject) under the window:
  * the naive spelling of q_vocab_topk's anti-pattern gets the
  * scale-safe plan automatically, with identical results. */
class GlobalRowNumberTopKSpec extends SparkSpec {

  // loaded once: Tables.load (re-)registers the rule, so tests that
  // disable it must not trigger another load afterwards
  private lazy val orders = Tables.load(spark, sf001, "orders")

  private def naiveTopK(k: Int) =
    orders
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .filter(col("rn") <= k)
      .select("o_orderkey", "o_totalprice", "rn")

  test("rewrites the naive global row_number top-k to a heap plan") {
    val df = naiveTopK(25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the window survives, but ranks only the k survivors
    assert(plan.contains("Window"), plan)
    assert(df.count() == 25)
  }

  test("rewritten results equal an independently computed top-k ranking") {
    // ground truth from a different spelling: global sort + limit,
    // ranked driver-side over the 40 survivors (the session's optimizer
    // batch list is frozen after first use, so the rule can't be
    // toggled off for an in-session unoptimized control)
    val got = naiveTopK(40).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sorted.toSeq
    val want = orders.select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(40)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getDouble(1), i + 1) }
      .sorted.toSeq
    assert(got == want)
  }

  test("extra conjuncts are kept and applied after ranking") {
    val df = orders
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .filter(col("rn") <= 30 && col("o_orderstatus") === "F")
      .select("o_orderkey", "rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // subset of the pure top-30, restricted by the residual predicate
    val pure = naiveTopK(30).select("o_orderkey").collect().map(_.getLong(0))
      .toSet
    assert(df.collect().map(_.getLong(0)).forall(pure.contains))
  }

  test("does not fire on partitioned windows or multi-expression windows") {
    val partitioned = orders
      .withColumn("rn", row_number().over(Window
        .partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .filter(col("rn") <= 5)
    assert(!partitioned.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    // a second global window expression makes the rewrite unsound: the
    // running sum over the full input must NOT become a sum over top-k
    val w = Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val multi = orders
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("o_totalprice").over(w))
      .filter(col("rn") <= 5)
    assert(!multi.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }
}
