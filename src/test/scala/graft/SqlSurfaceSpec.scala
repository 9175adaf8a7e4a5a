package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.refstar.RefStar

/** The SQL-text surface (reference EP3, src/job.py:260-283): a reference
  * user's queries run via spark.sql over registered views and agree with
  * the DataFrame programs. TO_CHAR(d,'Day') is the one documented rewrite
  * (→ date_format EEEE, SURVEY.md §2.7 F2). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "fixtures/ref"

  private def registerCurated(): Unit = {
    val cur = graft.curate.Curation
      .curate(Tables.load(spark, dir, "sellout"), dateColumn = Some("daily"))
    cur.clean.createOrReplaceTempView("sellout")
    Seq("chains", "stores", "products").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  test("the reference's queries.sql runs statement-by-statement") {
    registerCurated()
    // the reference SQL, TO_CHAR rewritten; trailing ';;' tolerated
    val script =
      """SELECT DATE_TRUNC('week', daily) AS semana,
        |       SUM(quantity) AS unidades
        |FROM sellout GROUP BY semana ORDER BY semana;
        |SELECT p.product_name, SUM(s.quantity) AS unidades
        |FROM sellout s JOIN products p ON s.product_id = p.product_id
        |GROUP BY p.product_name ORDER BY unidades DESC LIMIT 5;
        |SELECT c.chain_name, date_format(daily, 'EEEE') AS dia_semana,
        |       SUM(s.quantity) AS unidades
        |FROM sellout s
        |JOIN stores st ON s.store_id = st.store_id
        |JOIN chains c ON st.chain_id = c.chain_id
        |GROUP BY c.chain_name, dia_semana
        |ORDER BY c.chain_name, unidades DESC;;""".stripMargin
    val results = Tables.runSqlScript(spark, script)
    assert(results.length == 3)
    assert(results.forall(_._2.isSuccess))
    // q2 via SQL text == q2 via DataFrame program
    val sqlQ2 = results(1)._2.get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlQ2.head == ("It Annual Nehe", 13108L))
  }

  test("per-statement failure isolation: bad statement doesn't stop later ones") {
    registerCurated()
    val results = Tables.runSqlScript(spark,
      "SELECT COUNT(*) AS n FROM products; " +
        "SELECT * FROM no_such_table; " +
        "SELECT COUNT(*) AS n FROM chains")
    assert(results.length == 3)
    assert(results(0)._2.isSuccess && results(2)._2.isSuccess)
    assert(results(1)._2.isFailure)
    assert(results(2)._2.get.collect()(0).getLong(0) == 10L)
  }

  test("whole-dataset dump writes every table") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dump").toString
    val root = Tables.backupAll(spark, dir, RefStar.TableNames, tmp)
    RefStar.TableNames.foreach { t =>
      assert(spark.read.parquet(s"$root/$t").count() ==
        Tables.load(spark, dir, t).count())
    }
  }
}
