package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Typed Dataset API surface — the `KeyValueGroupedDataset` operators
  * (`cogroup`, with `groupByKey`) that are the escape hatch when per-key
  * logic needs arbitrary Scala over a key's full (sorted) group and both
  * relations at once.
  *
  * Scale posture: `cogroup` co-partitions BOTH inputs on the key in one
  * shuffle each — exactly the cost of the equivalent shuffle join — and
  * then streams each key's two iterators through the lambda; per-key
  * memory is one order's line items, bounded by entity activity. The
  * trade is codegen: the lambda is JVM code outside whole-stage codegen,
  * so the relational spelling wins whenever it exists (the oracle IS
  * that spelling — the gate proves the typed path computes the same
  * thing; an engine must offer both).
  */
object TypedOps {

  final case class OrderHdr(o_orderkey: Long, o_custkey: Long)
  final case class Item(
      l_orderkey: Long, l_linenumber: Int, l_extendedprice: Double)

  /** Per-order item profile via typed COGROUP (header ⋈ sorted items in
    * one pass of per-key Scala): item count, total cents, and the number
    * of strictly-increasing price steps in line-number order — the
    * sequential statistic that motivates the typed API (relationally it
    * needs a lag window; here it is a fold over the key's iterator).
    * Headers without items emit zeros (left-outer semantics). */
  val qCogroupOrders: Q = Q("q_cogroup_orders",
    """WITH it AS (SELECT l_orderkey, l_linenumber,
      |             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      |           FROM lineitem),
      |lg AS (SELECT l_orderkey, cents,
      |         lag(cents) OVER (PARTITION BY l_orderkey
      |           ORDER BY l_linenumber, cents) AS prev
      |       FROM it),
      |ag AS (SELECT l_orderkey, COUNT(*)::BIGINT AS n_items,
      |         CAST(SUM(cents) AS BIGINT) AS total_cents,
      |         CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL
      |                               AND cents > prev) AS BIGINT)
      |           AS n_price_incr
      |       FROM lg GROUP BY 1)
      |SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
      |       COALESCE(a.n_items, 0) AS n_items,
      |       COALESCE(a.total_cents, 0) AS total_cents,
      |       COALESCE(a.n_price_incr, 0) AS n_price_incr
      |FROM orders o LEFT JOIN ag a ON a.l_orderkey = o.o_orderkey
      |ORDER BY orderkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val hdrs = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .as[OrderHdr].groupByKey(_.o_orderkey)
    val items = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .as[Item].groupByKey(_.l_orderkey)
    hdrs.cogroup(items) { (key, hs, is) =>
      // (linenumber, cents) — the data carries duplicate line numbers,
      // so the sequential statistic needs a TOTAL order (same tiebreak
      // as the oracle's lag window)
      // half-away-from-zero, the same rounding as the oracle's
      // ROUND(x*100) and the engine's round(col*100, 0) — math.round
      // alone is half-up (toward +inf) and would diverge on negative
      // amounts (ADVICE r5)
      def cents100(p: Double): Long = {
        val v = p * 100
        val r = math.round(math.abs(v))
        if (v < 0) -r else r
      }
      val cents = is.toArray
        .map(i => (i.l_linenumber, cents100(i.l_extendedprice)))
        .sorted.map(_._2)
      val incr = cents.indices.drop(1).count(j => cents(j) > cents(j - 1))
      hs.map(h =>
        (key, h.o_custkey, cents.length.toLong, cents.sum, incr.toLong))
    }.toDF("orderkey", "custkey", "n_items", "total_cents", "n_price_incr")
      .orderBy("orderkey")
  }

  val all: Seq[Q] = Seq(qCogroupOrders)
}
