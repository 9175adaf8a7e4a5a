package graft.refstar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.curate.Curation
import graft.io.Tables

/** The reference pipeline on its own star schema
  * (chains/stores/products/sellout) — what a user of the reference runs
  * today, end to end: bootstrap → counts → curation (backup + invalid-row
  * removal) → the four analytic queries with per-query failure isolation
  * (reference src/job.py:286-331). The golden-parity spec pins this to the
  * reference's published run (README.md:20-80): 101,000 → 94,666 rows,
  * 6,334 removed, and the exact query outputs.
  *
  * Fixtures: parquet under `fixtures/ref/`, converted 1:1 from the reference's
  * DDL INSERT data by scripts/make_ref_fixtures.py.
  */
object RefStar {

  /** CLI twin of the reference's `main()` — run the whole ETL against the
    * fixtures and print the four report tables (reference shows the first
    * 10 rows in psql boxes; `df.show` is the same format). */
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "fixtures/ref"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("Iniciando proceso ETL")
    val r = runEtl(spark, dir)
    println(s"Conteo de registros por tabla: ${r.countsBefore}")
    println(s"Eliminados ${r.removedRows} registros problemáticos.")
    println(s"Conteo final después de curación: ${r.countsAfter}")
    println("Proceso ETL completado exitosamente")
    spark.stop()
  }

  val TableNames = Seq("chains", "stores", "products", "sellout")

  /** Fact-table name candidates, probed in order
    * (reference src/job.py:164). */
  val FactCandidates = Seq("combined_sellout", "sales", "sellout")

  final case class EtlReport(
      countsBefore: Map[String, Long],
      countsAfter: Map[String, Long],
      removedRows: Long,
      backupPath: Option[String],
      queryResults: Map[String, Either[Throwable, DataFrame]])

  /** Q1 — weekly units (reference sql/queries.sql:1-5). `semana` is the
    * Monday-start week as a timestamp, matching Postgres DATE_TRUNC. */
  def q1WeeklyUnits(sellout: DataFrame): DataFrame =
    sellout
      .groupBy(date_trunc("week", col("daily")).as("semana"))
      .agg(sum("quantity").as("unidades"))
      .orderBy("semana")

  /** Q2 — top-5 products (reference sql/queries.sql:7-13). */
  def q2TopProducts(sellout: DataFrame, products: DataFrame): DataFrame =
    sellout
      .join(broadcast(products), Seq("product_id"))
      .groupBy("product_name")
      .agg(sum("quantity").as("unidades"))
      .orderBy(desc("unidades"), asc("product_name"))
      .limit(5)

  /** Q3 — top-5 chain/store (reference sql/queries.sql:15-22). */
  def q3TopStores(sellout: DataFrame, stores: DataFrame,
      chains: DataFrame): DataFrame =
    sellout
      .join(broadcast(stores), Seq("store_id"))
      .join(broadcast(chains), Seq("chain_id"))
      .groupBy("chain_name", "store_name")
      .agg(sum("quantity").as("unidades"))
      .orderBy(desc("unidades"), asc("chain_name"), asc("store_name"))
      .limit(5)

  /** Q4 — seasonality per chain × weekday (reference sql/queries.sql:24-33).
    * Day names are unpadded English (`EEEE`), the engine's documented
    * deviation from TO_CHAR's 9-char blank padding (SURVEY.md §2.7 F2) —
    * the reference's own tabulate output strips the padding anyway. */
  def q4WeekdaySeasonality(sellout: DataFrame, stores: DataFrame,
      chains: DataFrame): DataFrame =
    sellout
      .join(broadcast(stores), Seq("store_id"))
      .join(broadcast(chains), Seq("chain_id"))
      .groupBy(col("chain_name"),
        date_format(col("daily"), "EEEE").as("dia_semana"))
      .agg(sum("quantity").as("unidades"))
      .orderBy(asc("chain_name"), desc("unidades"), asc("dia_semana"))

  /** Full ETL run (reference main(), src/job.py:286-331): load, count,
    * curate (timestamped backup + destructive filter), recount, run the
    * report queries with per-query error isolation (src/job.py:281-283). */
  def runEtl(spark: SparkSession, fixturesDir: String,
      backupDir: Option[String] = None,
      report: DataFrame => Unit = Tables.report(_)): EtlReport = {
    val load = (n: String) => Tables.load(spark, fixturesDir, n)
    val countsBefore = Tables.countTables(spark, fixturesDir, TableNames)

    val factName = Tables.firstExisting(spark, fixturesDir, FactCandidates)
      .getOrElse(throw new IllegalStateException(
        s"no fact table among $FactCandidates"))
    val cur = Curation.curate(load(factName), dateColumn = Some("daily"))
    val backupPath = backupDir.map { dir =>
      Tables.backup(cur.quarantined, dir, factName)
    }
    val removed = cur.quarantined.count()
    val sellout = cur.clean
    val countsAfter = countsBefore ++ Map(factName -> sellout.count())

    val chains = load("chains")
    val stores = load("stores")
    val products = load("products")
    val queries = Seq(
      "q1" -> (() => q1WeeklyUnits(sellout)),
      "q2" -> (() => q2TopProducts(sellout, products)),
      "q3" -> (() => q3TopStores(sellout, stores, chains)),
      "q4" -> (() => q4WeekdaySeasonality(sellout, stores, chains)))
    val results = queries.map { case (name, mk) =>
      name -> (try {
        val df = mk()
        report(df)
        Right(df)
      } catch { case e: Throwable => Left(e) })
    }.toMap
    EtlReport(countsBefore, countsAfter, removed, backupPath, results)
  }
}
