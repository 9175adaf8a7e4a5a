package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 32-bit text hash
  * (see [[TextHash]]): `int(md5(s)[0:8], 16) mod (2^31−1)`, i.e. the first
  * four md5 digest bytes big-endian, reduced mod P.
  *
  * Value-identical to the composed form
  * `conv(substring(md5(s), 1, 8), 16, 10) % P` — the composed form routes
  * bytes → hex string → substring → string-parsed decimal → bigint,
  * allocating three strings per call; this expression goes digest-bytes →
  * long directly and participates in whole-stage codegen via a static
  * call, so the shingle-hashing hot loop of the dedup operators stays
  * allocation-light. The DuckDB oracle keeps using the composed SQL form;
  * equality of the two is property-tested.
  */
case class Md5Mod31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_mod31"

  override protected def nullSafeEval(input: Any): Any =
    Md5Mod31.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Mod31.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5Mod31 = copy(child = newChild)
}

object Md5Mod31 {

  val FunctionName = "graft_md5_mod31"

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point referenced from generated code. */
  def hashUtf8(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % TextHash.P
  }

  /** Idempotent per-session registration (Spark 4 has no public
    * Column-from-Expression constructor; the function registry +
    * `call_function` is the supported route). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
          FunctionName))) {
      // cast at the registration boundary (AbstractDataType, the usual
      // ExpectsInputTypes route, is private[sql])
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        exprs => Md5Mod31(Cast(exprs.head, StringType)), "scala_udf")
    }
}
