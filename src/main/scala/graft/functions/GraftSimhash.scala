package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the SimHash signature of a
  * hashed-shingle array — one pass over the array instead of the composed
  * form's `width` separate `aggregate` HOF folds (each an interpreted
  * lambda dispatch per element; at width 62 that dominated the wide
  * SimHash queries the way the HOF dot product dominated ANN before
  * [[GraftDot]]).
  *
  * Value-identical to the composed spelling in
  * [[graft.dedup.Dedup.simhash32]]/`simhash62` and to the DuckDB oracle:
  * the per-bit vote sums are exact integer arithmetic (no FP anywhere),
  * `width = 32` votes on bits 0..31 of each hash, `width = 62` votes on
  * bits 0..30 of the hash and 0..30 of its LCG rehash
  * `(WideA*h + WideB) mod P` for signature bits 31..61.
  */
case class GraftSimhash(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(a: Any): Any =
    GraftSimhash.sig(a.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftSimhash.sig($c, $width)")

  override protected def withNewChildInternal(
      newChild: Expression): GraftSimhash = copy(child = newChild)
}

object GraftSimhash {

  val FunctionName = "graft_simhash"

  // LCG rehash constants for the wide layout (shared with Dedup)
  val WideA = 1664525L
  val WideB = 1013904223L
  val P = 2147483647L

  /** Static entry point referenced from generated code. Integer vote
    * arithmetic only — bit-identical to the HOF spelling by construction. */
  def sig(hs: ArrayData, width: Int): Long = {
    val n = hs.numElements()
    // width <= 32: all bits vote on h itself (the 32-bit layout; h < 2^31
    // so a bit-31 vote is always negative, matching the composed form).
    // width > 32: bits 0..30 on h, the rest on the LCG rehash.
    val lowBits = if (width <= 32) width else 31
    val votes = new Array[Int](width)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < lowBits) {
        votes(j) += (((h >> j) & 1L) * 2L - 1L).toInt
        j += 1
      }
      if (width > 32) {
        val h2 = (WideA * h + WideB) % P
        var k = 31
        while (k < width) {
          votes(k) += (((h2 >> (k - 31)) & 1L) * 2L - 1L).toInt
          k += 1
        }
      }
      i += 1
    }
    var s = 0L
    var j = 0
    while (j < width) {
      if (votes(j) > 0) s |= 1L << j
      j += 1
    }
    s
  }

  /** Idempotent per-session registration (function registry +
    * `call_function`, like [[GraftDot]]). Second argument must be an
    * integer literal width. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(FunctionName))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        exprs => {
          val width = exprs(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_simhash width must be an integer literal, got $other")
          }
          GraftSimhash(Cast(exprs(0), ArrayType(LongType)), width)
        }, "scala_udf")
    }
}
