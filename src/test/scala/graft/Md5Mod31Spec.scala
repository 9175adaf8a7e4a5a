package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Md5Mod31, TextHash}
import graft.io.Tables

/** The native hash expression must be value-identical to the composed
  * conv(substring(md5)) form the DuckDB oracle uses. */
class Md5Mod31Spec extends SparkSpec {

  private def reference(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % TextHash.P
  }

  test("property: hashUtf8 equals hex-parse reference on random strings") {
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "the quick brown fox", "ünïcødé 漢字 🦆") ++
      (1 to 500).map { _ =>
        val len = rnd.nextInt(40)
        (1 to len).map { _ =>
          if (rnd.nextBoolean()) (rnd.nextInt(94) + 33).toChar
          else (rnd.nextInt(0x4000) + 0x100).toChar
        }.mkString
      }
    samples.foreach { s =>
      assert(Md5Mod31.hashUtf8(UTF8String.fromString(s)) == reference(s), s)
    }
  }

  test("native expression equals composed form over the corpus tokens") {
    Md5Mod31.ensureRegistered(spark)
    val toks = Tables.load(spark, sf001, "documents")
      .select(explode(TextHash.tokens(col("text"))).as("t"))
    val diff = toks.select(
      TextHash.hash32(col("t")).as("fast"),
      TextHash.hash32Composed(col("t")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("expression participates in codegen (no eval fallback in plan)") {
    Md5Mod31.ensureRegistered(spark)
    val df = Tables.load(spark, sf001, "documents")
      .select(TextHash.hash32(col("text")).as("h"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_md5_mod31"), plan)
  }
}
