package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer squared distance Σ(a_i − b_i)² of two `array<bigint>`
  * columns — the Lloyd-assignment kernel (r15 optimization).
  *
  * Why a third kernel next to [[GraftDotLong]] when the dot identity
  * Σc² + Σm² − 2⟨c,m⟩ already codegens: the identity spelling embeds the
  * driver-folded Σm² (and the ×2) as PRIMITIVE literals in the generated
  * source, so every Lloyd round — whose centroid matrix changes — produces
  * a textually different whole-stage source and pays a fresh janino
  * compile (JobProfile r15: q_kmeans_converged spent 1.46 s of its 2.57 s
  * in driver gaps, ~0.1 s per round, almost all plan+compile). A fused
  * kernel takes the centroid as an ARRAY literal, which Spark codegen
  * routes through the references array rather than the source text —
  * identical source every round, one compile per session, and one array
  * pass instead of two dot calls.
  *
  * Exactness: strict ascending element-order accumulation over
  * min(length); for the engine's equal-length int8 codes (|x| ≤ 127, 64
  * dims) each term ≤ 254² and the sum ≤ 64·254² ≪ 2⁶³ — value-identical
  * to both the dot-identity spelling and the HOF reference
  * (KmeansSpec pins all three). */
case class GraftSqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftSqDistLong.sq(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftSqDistLong.sq($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GraftSqDistLong =
    copy(left = newLeft, right = newRight)
}

object GraftSqDistLong {

  val FunctionName = "graft_sqdist_long"

  /** Static entry point referenced from generated code. */
  def sq(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
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
        exprs => GraftSqDistLong(
          Cast(exprs(0), ArrayType(LongType)),
          Cast(exprs(1), ArrayType(LongType))), "scala_udf")
    }
}
