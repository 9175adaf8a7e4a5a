package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.plans.TopKPerKey

/** The custom heap-based per-key top-k operator must agree with the
  * window-function spelling and actually plan through the custom exec. */
class TopKPerKeySpec extends SparkSpec {

  test("topKPerKey equals row_number window filter (k=3 suppliers/nation)") {
    val li = Tables.load(spark, sf001, "lineitem")
    val sup = Tables.load(spark, sf001, "supplier")
    val nat = Tables.load(spark, sf001, "nation")
    val agg = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_name"))
      .agg(sum("l_quantity").cast("long").as("units"))

    val viaWindow = agg.withColumn("rn", row_number().over(
        Window.partitionBy("n_name").orderBy(desc("units"), asc("s_name"))))
      .filter(col("rn") <= 3).drop("rn")
    val viaCustom = TopKPerKey.topKPerKey(agg, Seq("n_name"),
      Seq("units" -> false, "s_name" -> true), 3)

    assert(viaCustom.count() == viaWindow.count())
    assert(viaCustom.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaCustom).count() == 0)
  }

  test("plan uses TopKPerKeyExec, not a sort") {
    val orders = Tables.load(spark, sf001, "orders")
    val top = TopKPerKey.topKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false), 2)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan) // exec node present
    assert(!plan.contains("Sort "), plan) // and no partition sort
    // per-customer cardinality: no customer exceeds k rows
    val over = top.groupBy("o_custkey").count().filter(col("count") > 2)
    assert(over.count() == 0)
  }

  test("map-side partial pass is value-identical on a total order") {
    // a LOW-cardinality key (o_orderpriority: 5 values) with a unique
    // tiebreak — the combined form must pick exactly the single-pass rows
    val orders = Tables.load(spark, sf001, "orders")
    val single = TopKPerKey.topKPerKey(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 7)
    val combined = TopKPerKey.topKPerKey(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 7,
      mapSideCombine = true)
    assert(combined.count() == single.count())
    assert(combined.except(single).count() == 0)
    assert(single.except(combined).count() == 0)
    // the partial pass must run BEFORE the exchange (map side): in the
    // plan tree the second TopKPerKey sits under the Exchange
    val plan = combined.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val firstTopK = lines.indexWhere(_.contains("TopKPerKey"))
    val exchange = lines.indexWhere(_.contains("Exchange"))
    val partialTopK = lines.lastIndexWhere(_.contains("TopKPerKey"))
    assert(firstTopK < exchange && exchange < partialTopK, plan)
  }

  test("k larger than group size keeps all rows") {
    val nation = Tables.load(spark, sf001, "nation")
    val all = TopKPerKey.topKPerKey(nation, Seq("n_regionkey"),
      Seq("n_name" -> true), 1000)
    assert(all.count() == nation.count())
  }
}
