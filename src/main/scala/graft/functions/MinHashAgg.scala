package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY.md §7.3's custom-Aggregator
  * slot): folds a stream of element hashes into the K-signature
  * incrementally — the form needed when a document arrives exploded
  * (row-per-token storage) or when maintaining sketches incrementally in
  * a stateful stream, where the array-expression form
  * ([[TextHash.minhash]]) has no single array to scan.
  *
  * Signature-identical to the array form (same affine family over
  * [[TextHash.P]]); the spec asserts element-wise equality. Buffers merge
  * by element-wise min, so partial aggregation (map-side combine) works —
  * each partition ships K longs, not its rows.
  */
class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import TextHash.{As, Bs, K, P}

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var k = 0
    while (k < K) {
      val v = (As(k) * h + Bs(k)) % P
      if (v < buf(k)) buf(k) = v
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column form: `df.groupBy("doc_id").agg(MinHashAgg.minhashSig($"h"))`. */
  def minhashSig(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new MinHashAgg)
      .apply(c).name("minhash_sig")
}
