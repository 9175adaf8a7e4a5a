package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.GraftSimhash
import graft.io.Tables

/** The native one-pass SimHash expression must be value-identical to the
  * composed per-bit `aggregate` spelling (whose semantics the DuckDB
  * oracles mirror) at both widths, and must stay in codegen. */
class GraftSimhashSpec extends SparkSpec {

  test("property: native signature equals composed form at widths 32/62") {
    GraftSimhash.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // hashes live in [0, 2^31-1) like the md5-derived shingle hashes;
    // include empty and single-element arrays
    val rows = (1 to 300).map { i =>
      val n = if (i <= 3) i - 1 else rnd.nextInt(120)
      Tuple1(Seq.fill(n)(rnd.nextLong().abs % 2147483647L))
    }
    val diff = rows.toDF("hs")
      .select(
        Dedup.simhash32(col("hs")).as("n32"),
        Dedup.simhash32Composed(col("hs")).as("c32"),
        Dedup.simhash62(col("hs")).as("n62"),
        Dedup.simhash62Composed(col("hs")).as("c62"))
      .filter(col("n32") =!= col("c32") || col("n62") =!= col("c62"))
    assert(diff.count() == 0)
  }

  test("expression participates in codegen (no eval fallback in plan)") {
    val plan = Tables.load(spark, sf001, "documents")
      .select(Dedup.simhash32(array(col("doc_id"))).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_simhash"), plan)
  }

  test("width must be a literal") {
    GraftSimhash.ensureRegistered(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1L))).toDF("hs")
        .select(call_function(GraftSimhash.FunctionName,
          col("hs"), col("hs"))).collect()
    }
    assert(e.toString.contains("integer literal"), e.toString)
  }
}
