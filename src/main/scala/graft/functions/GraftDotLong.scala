package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer sibling of [[GraftDot]]: the sequential dot product of two
  * `array<bigint>` columns — the scan/rerank kernel of the int8
  * quantized vector tier (`q_ann_int8`), where similarity is pure
  * integer arithmetic by design. Same contract as GraftDot: strict
  * ascending element-order accumulation over min(length) for the
  * equal-length, null-free arrays the engine produces; long overflow is
  * impossible for quantized codes (|c| ≤ 127, so 64 dims bound the sum
  * by 64·127² ≪ 2⁶³). The HOF spelling
  * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` is value-identical but
  * interpreted per element (the GraftDot lesson, VERDICT r1 #3); this
  * compiles into the whole-stage-codegen'd static call below — the
  * SqlTwins override keeps the HOF spelling, so twin parity re-proves
  * the equivalence on every run. */
case class GraftDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftDotLong.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftDotLong.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GraftDotLong =
    copy(left = newLeft, right = newRight)
}

object GraftDotLong {

  val FunctionName = "graft_dot_long"

  /** Static entry point referenced from generated code. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Idempotent per-session registration (the [[GraftDot]] route). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(FunctionName))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        exprs => GraftDotLong(
          Cast(exprs(0), ArrayType(LongType)),
          Cast(exprs(1), ArrayType(LongType))), "scala_udf")
    }
}
