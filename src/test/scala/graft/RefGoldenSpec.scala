package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.refstar.RefStar

/** Golden-parity suite: the engine must reproduce the reference's own
  * published run (reference README.md:20-80) on the reference's own data
  * (fixtures/ref, converted 1:1 from the ddl .sql files). */
class RefGoldenSpec extends SparkSpec {

  private val dir = "fixtures/ref"
  private lazy val report = RefStar.runEtl(spark, dir, report = _ => ())

  test("count invariants: 101000 -> 94666 with 6334 removed") {
    assert(report.countsBefore == Map(
      "chains" -> 10L, "stores" -> 400L, "products" -> 80L,
      "sellout" -> 101000L))
    assert(report.removedRows == 6334L)
    assert(report.countsAfter("sellout") == 94666L)
  }

  test("q1 golden: first-10 weekly sums match README.md:29-38") {
    val expected = Seq(
      ("2021-01-18", 2634L), ("2021-01-25", 4797L), ("2021-02-01", 4988L),
      ("2021-02-08", 5049L), ("2021-02-15", 4692L), ("2021-02-22", 4767L),
      ("2021-03-01", 4699L), ("2021-03-08", 5138L), ("2021-03-15", 4828L),
      ("2021-03-22", 4492L))
    val got = report.queryResults("q1").toOption.get
      .select(to_date(col("semana")).cast("string"), col("unidades"))
      .limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q2 golden: top-5 products match README.md:46-51") {
    val expected = Seq(
      ("It Annual Nehe", 13108L), ("Asoka Giant-trumpets", 12807L),
      ("Regrant Chee Reedgrass", 12768L), ("Sub-Ex Coville's Rush", 12704L),
      ("Tampflex Splitleaf Cyanea", 12686L))
    val got = report.queryResults("q2").toOption.get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q3 golden: top-5 chain/store match README.md:58-63") {
    val expected = Seq(
      ("Feedspan", "8662 Old Shore Crossing", 3091L),
      ("Aimbu", "93426 Old Gate Junction", 2843L),
      ("Ailane", "91936 Havey Trail", 2834L),
      ("Tazzy", "239 Pond Park", 2832L),
      ("Edgeify", "4 Kings Place", 2829L))
    val got = report.queryResults("q3").toOption.get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q4 golden: first-10 chain-weekday rows match README.md:70-80") {
    val expected = Seq(
      ("Ailane", "Monday", 16788L), ("Ailane", "Sunday", 16505L),
      ("Ailane", "Saturday", 16062L), ("Ailane", "Thursday", 15957L),
      ("Ailane", "Wednesday", 15833L), ("Ailane", "Tuesday", 14965L),
      ("Ailane", "Friday", 14810L), ("Aimbu", "Sunday", 15883L),
      ("Aimbu", "Saturday", 15876L), ("Aimbu", "Wednesday", 15325L))
    val got = report.queryResults("q4").toOption.get
      .limit(10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("fact-table probing follows the reference candidate order") {
    // fixtures name the table 'sellout'; candidates probe combined_sellout
    // and sales first, tolerating their absence (src/job.py:100-112)
    assert(graft.io.Tables.firstExisting(spark, dir,
      RefStar.FactCandidates).contains("sellout"))
  }

  test("backup sink writes the quarantined rows before removal") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_backup")
      .toString
    val r = RefStar.runEtl(spark, dir, backupDir = Some(tmp),
      report = _ => ())
    val backup = spark.read.parquet(r.backupPath.get)
    assert(backup.count() == 6334L)
    assert(r.backupPath.get.contains("sellout_backup_"))
  }
}
