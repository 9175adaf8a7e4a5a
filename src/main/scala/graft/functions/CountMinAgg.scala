package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed count-min sketch aggregator (Cormode & Muthukrishnan 2005): D
  * hash rows × W counters over a stream of element hashes — the mergeable
  * heavy-hitter/frequency sketch next to [[MinHashAgg]]'s similarity
  * sketch. `reduce` bumps one counter per row; buffers merge by
  * element-wise SUM, so partial aggregation (map-side combine) ships D×W
  * longs per partition, never rows — the property that makes a
  * frequency-of-everything query one narrow shuffle at any corpus size.
  *
  * Point estimates read `min_j cells(j, h_j(x))`: an upper bound on the
  * true count, exact when x collides with nothing in some row. The hash
  * rows are the first D members of the SAME md5-derived affine family as
  * MinHash ([[TextHash.As]]/[[TextHash.Bs]] over [[TextHash.P]]), so a
  * SQL oracle recomputes identical cells — the estimates are
  * deterministic, collisions included.
  *
  * W here is sized to the synthetic corpus's ~31-token vocabulary so
  * collisions actually occur and the overestimate path is exercised; a
  * real deployment sizes W ≈ ⌈e/ε⌉ and D ≈ ⌈ln 1/δ⌉. */
class CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import CountMinAgg.{D, W, cell}

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < D) { buf(j * W + cell(j, h)) += 1L; j += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  import TextHash.{As, Bs, P}

  /** Sketch shape: D hash rows × W counters (flattened row-major). */
  val D = 4
  val W = 32

  /** Counter index of hash `h` in row `j` (0-based). */
  def cell(j: Int, h: Long): Int = (((As(j) * h + Bs(j)) % P) % W).toInt

  /** Column twin of [[cell]] (all long arithmetic, engine-portable). */
  def cellCol(j: Int, h: Column): Column =
    ((lit(As(j)) * h + lit(Bs(j))) % lit(P)) % lit(W)

  /** DuckDB twin of [[cell]]. */
  def cellSql(j: Int, h: String): String =
    s"((${As(j)}::BIGINT * $h + ${Bs(j)}) % $P) % $W"

  /** Column form: `df.agg(CountMinAgg.sketch($"h"))`. */
  def sketch(c: Column): Column =
    udaf(new CountMinAgg).apply(c).name("cm_sketch")

  /** Point estimate `min_j sk[j·W + cell_j(h)]` over a sketch column
    * (1-based element_at; `sk` is a materialized array column, so the
    * indexing is a plain lookup, not a re-inlinable transform). */
  def estimate(sk: Column, h: Column): Column =
    least((0 until D).map { j =>
      element_at(sk, (lit(j * W) + cellCol(j, h) + lit(1)).cast("int"))
    }: _*)
}
