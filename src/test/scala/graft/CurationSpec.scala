package graft

import org.apache.spark.sql.functions.col

import graft.curate.Curation
import graft.model.Schemas

/** Curation semantics (SURVEY.md §2.11; reference src/job.py:159-258):
  * validity split, permissive date cast, measure detection, idempotence. */
class CurationSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def selloutDf = {
    val rows = Seq(
      org.apache.spark.sql.Row(1, 1, "2021/07/04", Integer.valueOf(5)),
      org.apache.spark.sql.Row(1, 2, "2021/07/05", Integer.valueOf(0)),
      org.apache.spark.sql.Row(2, 1, "2021/07/06", Integer.valueOf(-2)),
      org.apache.spark.sql.Row(2, 2, "2021/07/07", null),
      org.apache.spark.sql.Row(3, 1, "2021/07/08", Integer.valueOf(2000000)),
      org.apache.spark.sql.Row(3, 2, "2021/07/09", Integer.valueOf(20)))
    spark.createDataFrame(rows.asJava, Schemas.selloutRaw)
  }

  test("validity split matches reference predicate P1") {
    val r = Curation.curate(selloutDf, dateColumn = Some("daily"))
    assert(r.measureColumn == "quantity")
    assert(r.clean.count() == 2)      // 5 and 20
    assert(r.quarantined.count() == 4) // 0, -2, null, 2000000
  }

  test("date cast is the permissive yyyy/MM/dd path, not bare CAST") {
    val r = Curation.curate(selloutDf, dateColumn = Some("daily"))
    val dates = r.clean.select("daily").collect().map(_.getDate(0).toString)
    assert(dates.sorted.sameElements(Array("2021-07-04", "2021-07-09")))
    assert(r.clean.schema("daily").dataType ==
      org.apache.spark.sql.types.DateType)
  }

  test("dash-guarded fallback nulls slashed input (reference dead path)") {
    val df = selloutDf.withColumn(
      "fb", Curation.parseDashDateGuarded(col("daily")))
    assert(df.filter(col("fb").isNotNull).count() == 0)
  }

  test("curation is idempotent") {
    val once = Curation.curate(selloutDf, dateColumn = Some("daily"))
    val twice = Curation.curate(once.clean)
    assert(twice.quarantined.count() == 0)
    assert(twice.clean.count() == once.clean.count())
  }

  test("measure detection: candidates first, else first numeric") {
    assert(Schemas.detectMeasureColumn(Schemas.selloutRaw)
      .contains("quantity"))
    assert(Schemas.detectMeasureColumn(Schemas.stores).contains("chain_id"))
    assert(Schemas.detectMeasureColumn(
      org.apache.spark.sql.types.StructType(Nil)).isEmpty)
    // case-insensitive candidate match, reference src/job.py:145-147
    val caps = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("QUANTITY",
        org.apache.spark.sql.types.IntegerType)))
    assert(Schemas.detectMeasureColumn(caps).contains("QUANTITY"))
  }

  test("observed curation: D5 verify counts ride the clean pass (one scan)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5L)), (2L, Some(-1L)), (3L, None),
      (4L, Some(2000000L)), (5L, Some(7L)), (6L, Some(1L)))
      .toDF("id", "quantity")
    val (clean, obs, measure) =
      graft.curate.Curation.curateObserved(df)
    assert(measure == "quantity")
    val nClean = clean.count() // the ONLY action — metrics ride it
    val m = obs.get
    assert(m("n_total") == 6L, m)
    assert(m("n_invalid") == 3L, m) // -1, null, 2e6
    assert(m("n_null_measure") == 1L, m)
    // the reference's D5 invariant: after == before - deleted
    assert(nClean == m("n_total").asInstanceOf[Long]
      - m("n_invalid").asInstanceOf[Long])
    // the filter must NOT have been pushed below the metrics barrier:
    // n_total counts every input row, not just survivors
    assert(m("n_total").asInstanceOf[Long] != nClean)
    // parity with the two-frame split on the same input
    val r = graft.curate.Curation.curate(df)
    assert(r.quarantined.count() == m("n_invalid").asInstanceOf[Long])
  }
}
