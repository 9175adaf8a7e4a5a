package graft

import org.apache.spark.sql.functions._

import graft.curate.Curation
import graft.io.Tables
import graft.queries.{RefQueries, RelOps}

/** Property-style invariants (SURVEY.md §5): results must not depend on
  * physical layout, and curation must be a projection-stable fixpoint. */
class PropertySpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("aggregates are partition-count invariant") {
    val li = Tables.load(spark, sf001, "lineitem")
    val base = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("long").as("u"))
    Seq(1, 7, 64).foreach { n =>
      val re = li.repartition(n).groupBy("l_returnflag")
        .agg(sum("l_quantity").cast("long").as("u"))
      assert(canon(re).sameElements(canon(base)), s"partitions=$n")
    }
  }

  test("top-k is a prefix of the full sort under the tiebreak") {
    val full = RelOps.qTopkOrders.fn(spark, sf001) // limit 10
    val sorted = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))
      .orderBy(desc("price_cents"), asc("o_orderkey"))
      .limit(30).collect().take(10)
    assert(full.collect().map(_.toSeq).toSeq ==
      sorted.map(_.toSeq).toSeq)
  }

  test("to_date('yyyy/MM/dd') round-trips generated dates") {
    val rnd = new scala.util.Random(7)
    val dates = (1 to 200).map { _ =>
      java.time.LocalDate.ofEpochDay(rnd.between(0L, 25000L))
    }
    import spark.implicits._
    val df = dates.map(_.toString).toDF("iso")
      .withColumn("d0", to_date(col("iso")))
      .withColumn("raw", date_format(col("d0"), "yyyy/MM/dd"))
      .withColumn("d1", Curation.parseSlashedDate(col("raw")))
    assert(df.filter(col("d0") =!= col("d1")).count() == 0)
  }

  test("query results are deterministic across runs") {
    val a = RefQueries.q4WeekdaySeasonality.fn(spark, sf001).collect()
    val b = RefQueries.q4WeekdaySeasonality.fn(spark, sf001).collect()
    assert(a.sameElements(b))
  }
}
