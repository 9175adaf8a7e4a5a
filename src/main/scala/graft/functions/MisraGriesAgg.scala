package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge
  * rule from Agarwal et al., "Mergeable Summaries", PODS 2012): at most
  * `k` (token, residual) pairs whatever the stream length.
  *
  * `reduce`: increment a tracked token, insert while capacity remains,
  * otherwise decrement ALL residuals by one (dropping zeros) — the
  * classical frequent-items step. `merge`: sum residuals, then subtract
  * the (k+1)-th largest residual and drop non-positives, which restores
  * capacity ≤ k while preserving the error bound. Both paths maintain
  * the invariant (total decrement applied to any token) ≤ N/(k+1), so
  * EVERY token with true count > N/(k+1) survives in the merged summary
  * — the guarantee [[graft.text.TextOps.qHeavyHitters]] builds its
  * exact two-pass answer on. Summaries are k-sized however large the
  * corpus: partial aggregation ships ≤ k pairs per partition, the
  * driver never sees a data-scaled state (the [[CountMinAgg]] posture,
  * but with adversarially-safe deterministic membership instead of
  * probabilistic counts).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long],
      tok: String): Map[String, Long] =
    m.get(tok) match {
      case Some(c) => m.updated(tok, c + 1L)
      case None if m.size < k => m.updated(tok, 1L)
      case None => // decrement-all: one shared "charge" against every token
        m.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest residual: ≤ k strictly-larger
      // values stay positive, and the subtraction is ≤ N_b/(k+1) total
      val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > kth => t -> (c - kth) }
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {
  /** Column form: `df.agg(MisraGriesAgg.summary(col("tok"), 28))`. */
  def summary(c: Column, k: Int): Column =
    udaf(new MisraGriesAgg(k)).apply(c).name("mg_summary")
}
