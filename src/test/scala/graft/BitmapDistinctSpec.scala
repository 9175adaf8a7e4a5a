package graft

import org.apache.spark.sql.functions._

import graft.functions.BitmapDistinctAgg

/** The exact bitmap distinct-count aggregator: the accelerator must be
  * bit-identical to COUNT(DISTINCT) (it is exact, not a sketch), hold
  * under repartitioning (OR-merge is commutative+associative), and fail
  * fast outside its domain rather than silently miscount. */
class BitmapDistinctSpec extends SparkSpec {

  private def agg = udaf(new BitmapDistinctAgg(BitmapDistinctAgg.SqlDomain))

  test("bitmap distinct equals COUNT(DISTINCT) on the real fact table") {
    val li = graft.io.Tables.load(spark, sf001, "lineitem")
    val bitmap = li.groupBy("l_returnflag")
      .agg(agg(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bitmap == naive)
    assert(bitmap.values.forall(_ > 0))
  }

  test("repartition-invariant: same counts at 1, 7 and 32 partitions") {
    val li = graft.io.Tables.load(spark, sf001, "lineitem")
    val ref = li.coalesce(1).groupBy("l_returnflag")
      .agg(agg(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(7, 32).foreach { p =>
      val got = li.repartition(p).groupBy("l_returnflag")
        .agg(agg(col("l_suppkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == ref, s"p=$p")
    }
  }

  test("duplicate-heavy input: one bit per key, however many rows") {
    import spark.implicits._
    val df = (0 until 10000).map(i => i % 7).toDF("k")
    val n = df.agg(agg(col("k").cast("long")).as("n")).first().getLong(0)
    assert(n == 7L)
  }

  test("stats-sized domain counts keys far beyond the SQL fixed domain") {
    // ADVICE/VERDICT r7 next #6: q_bitmap_distinct derives its domain
    // from a max-key probe, so keys past SqlDomain (the old SF ceiling)
    // count exactly instead of failing
    import spark.implicits._
    val keys = (0 until 1000).map(i => (1L << 20) + i * 37L)
    val df = (keys ++ keys).toDF("k") // duplicated: bitmap must dedup
    val dom = df.agg(max("k")).first().getLong(0) + 1
    assert(dom > BitmapDistinctAgg.SqlDomain)
    val n = df.agg(BitmapDistinctAgg.sizedDistinct(col("k"), dom).as("n"))
      .first().getLong(0)
    assert(n == 1000L)
  }

  test("past MaxDomain the sized chooser falls back to COUNT(DISTINCT)") {
    import spark.implicits._
    val df = Seq(1L, 5L, 1L, (1L << 40)).toDF("k")
    // a 2^40 key domain cannot be a dense bitmap; the fallback leg must
    // still be exact
    val n = df.agg(
      BitmapDistinctAgg.sizedDistinct(col("k"), (1L << 40) + 1).as("n"))
      .first().getLong(0)
    assert(n == 3L)
  }

  test("keys outside the domain fail fast, never miscount silently") {
    import spark.implicits._
    val bad = Seq(-1L, 5L).toDF("k")
    val e = intercept[Exception] {
      bad.agg(agg(col("k")).as("n")).first()
    }
    assert(e.toString.contains("bitmap_distinct") ||
      Option(e.getCause).exists(_.toString.contains("bitmap_distinct")) ||
      e.toString.contains("IllegalArgument"), e.toString)
  }
}
