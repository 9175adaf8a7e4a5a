package graft

import graft.io.Tables
import graft.queries.RefQueries

/** Reference-parity queries over the sf0.001 fixtures (SURVEY.md §2). */
class RefQueriesSpec extends SparkSpec {

  test("q1: weekly buckets are Monday-start and totals preserve the sum") {
    val out = RefQueries.q1WeeklyUnits.fn(spark, sf001).collect()
    assert(out.nonEmpty)
    // week key is a Monday for every row
    assert(out.forall(_.getDate(0).toLocalDate.getDayOfWeek
      == java.time.DayOfWeek.MONDAY))
    // partition-invariant total: sum of weekly units == sum of quantities
    val total = out.map(_.getLong(1)).sum
    val expected = Tables.load(spark, sf001, "lineitem")
      .agg(org.apache.spark.sql.functions.sum("l_quantity"))
      .collect()(0).getDouble(0).toLong
    assert(total == expected)
  }

  test("q2: top-5 by units desc with deterministic tiebreak") {
    val rows = RefQueries.q2TopProducts.fn(spark, sf001).collect()
    assert(rows.length == 5)
    val units = rows.map(_.getLong(1))
    assert(units.sameElements(units.sortBy(-_)))
  }

  test("q3: uses broadcast joins (no fact-side shuffle before agg)") {
    val df = RefQueries.q3TopSuppliers.fn(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(df.collect().length == 5)
  }

  test("q4: one row per (nation, weekday) present in the data") {
    val rows = RefQueries.q4WeekdaySeasonality.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length)
    val days = rows.map(_.getString(1)).toSet
    assert(days.subsetOf(Set("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday")))
  }

  test("curation stats: clean + removed == total, zero removed here") {
    val r = RefQueries.qCurateStats.fn(spark, sf001).collect()(0)
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
    assert(r.getLong(1) == 0) // testdata quantities are all in (0, 1e6]
  }

  test("table counts: matches expected sf0.001 cardinalities") {
    val counts = RefQueries.qTableCounts.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("lineitem") == 6000)
    assert(counts("region") == 5)
    assert(counts("nation") == 25)
    assert(counts.size == 10)
  }

  test("date cast roundtrip: parsed equals source date, fallback all null") {
    val bad = RefQueries.qDateCastRoundtrip.fn(spark, sf001)
      .filter("daily IS NULL OR daily_fallback IS NOT NULL")
    assert(bad.count() == 0)
  }

  test("entry: flagship smoke (driver contract)") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
    // every registered query has unique name; oracle keys ⊆ query keys
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
