package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Source/sink round-trips (SURVEY.md §2.1 S1/S4/S5 generalized beyond
  * parquet). */
class TablesIoSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows under an explicit schema") {
    val orders = Tables.load(spark, sf001, "orders")
    val path = tmp("graft_csv")
    Tables.writeCsv(orders, path)
    val back = Tables.loadCsv(spark, path, orders.schema)
    assert(back.count() == orders.count())
    assert(back.except(orders).count() == 0)
  }

  test("json round-trip preserves rows under an explicit schema") {
    val nation = Tables.load(spark, sf001, "nation")
    val path = tmp("graft_json")
    Tables.writeJson(nation, path)
    val back = Tables.loadJson(spark, path, nation.schema)
    assert(back.count() == nation.count())
    assert(back.except(nation).count() == 0)
  }

  test("missing-table probe tolerates absence (reference 'No existe')") {
    assert(!Tables.exists(spark, sf001, "combined_sellout"))
    assert(Tables.countTables(spark, sf001,
      Seq("nation", "no_such_table"))("no_such_table") == -1L)
  }
}
