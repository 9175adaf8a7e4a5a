package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count over a bounded integer key domain via a bitmap
  * OR-merge — the classic OLAP bitmap-index accelerator (the same shape
  * RoaringBitmap serves in Druid/ClickHouse/Kylin, fixed-width here
  * because the test domain is dense and small): `reduce` sets one bit,
  * `merge` ORs two words arrays, `finish` popcounts. Unlike
  * `COUNT(DISTINCT x)` — which shuffles every distinct (group, x) pair —
  * the bitmap is a FIXED-SIZE mergeable state: partial aggregation ships
  * ⌈domain/64⌉ words per (partition, group) whatever the row count, and
  * the merge is commutative+associative, so the result is
  * repartition-invariant and exact (spec-pinned), never approximate.
  *
  * Scale posture: right when the key domain is bounded and dense
  * (surrogate keys, enum codes — here TPC-H part/supplier keys). For
  * sparse 64-bit domains the production move is a compressed bitmap
  * (roaring containers) or the HLL sketch family already in the engine
  * ([[graft.text.TextOps.qCountminTokens]] / q_hll_distinct); the
  * aggregator contract (fixed-size state, OR merge) stays identical.
  *
  * Keys outside [0, domain) fail fast with the offending value — a
  * silent mask would return a WRONG exact count.
  */
class BitmapDistinctAgg(domain: Int)
    extends Aggregator[Long, Array[Long], Long] {
  require(domain > 0 && domain <= (1 << 26),
    s"domain $domain outside (0, 2^26]") // 2^26 bits = 8 MB state cap

  private val words = (domain + 63) >>> 6

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    require(x >= 0 && x < domain,
      s"bitmap_distinct key $x outside [0, $domain)")
    b((x >>> 6).toInt) |= 1L << (x & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]()
}

object BitmapDistinctAgg {
  /** Shared domain for the SQL-registered form (`bitmap_distinct`):
    * covers every TPC-H surrogate key at the test scales with headroom.
    * (A SQL function signature cannot probe table stats; the registered
    * q_bitmap_distinct query sizes its domain from a min/max probe
    * instead and has no SF ceiling.) */
  val SqlDomain: Int = 1 << 20

  /** Largest domain the dense bitmap is allowed: 2^26 bits = 8 MiB of
    * mergeable state per (partition, group). Past this, callers should
    * fall back to COUNT(DISTINCT) or an HLL sketch — matching the class
    * require(), but as a queryable constant for build-time sizing. */
  val MaxDomain: Int = 1 << 26

  /** Column form, for DataFrame/streaming aggregates. */
  def distinctCount(c: org.apache.spark.sql.Column,
      domain: Int = SqlDomain): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new BitmapDistinctAgg(domain))
      .apply(c)

  /** Stats-sized exact distinct: the bitmap accelerator when the key
    * domain (derived by the caller from a min/max probe) fits
    * [[MaxDomain]], the exact COUNT(DISTINCT) shuffle otherwise. Both
    * legs are exact longs, so the choice is invisible in results —
    * only in the plan's state size. */
  def sizedDistinct(c: org.apache.spark.sql.Column,
      domain: Long): org.apache.spark.sql.Column =
    if (domain > 0 && domain <= MaxDomain) distinctCount(c, domain.toInt)
    else org.apache.spark.sql.functions.countDistinct(c)
}
