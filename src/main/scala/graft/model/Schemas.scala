package graft.model

import org.apache.spark.sql.types._

/** Schema registry for the engine.
  *
  * Two fixture families (see /root/repo/FIXTURES.md):
  *   - the reference's star schema (chains/stores/products/sellout), from
  *     /root/reference/ddl/{chains,stores,products,combined_sellout}.sql
  *   - the driver testdata star schema + LLM-pipeline tables
  *     (parquet under /root/testdata/sf0.001, sf0.01, sf0.1)
  *
  * The reference discovers numeric columns at runtime instead of hardcoding
  * them (reference src/job.py:135-152); [[numericColumns]] and
  * [[detectMeasureColumn]] reproduce that capability off a Spark schema —
  * driver-side metadata only, no executor work.
  */
object Schemas {

  /** Reference star schema (reference ddl/chains.sql:3-6, ddl/stores.sql:2-6,
    * ddl/products.sql:2-6, ddl/combined_sellout.sql:2-7). */
  val chains: StructType = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("chain_name", StringType)))

  val stores: StructType = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("store_name", StringType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("active", BooleanType)))

  /** Raw sellout: `daily` arrives as 'yyyy/MM/dd' strings; curation casts it
    * to DateType (reference src/job.py:186-188). */
  val selloutRaw: StructType = StructType(Seq(
    StructField("store_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("daily", StringType),
    StructField("quantity", IntegerType)))

  /** Driver testdata table names (TESTDATA.md). */
  val testTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Preferred measure-column candidates, in priority order
    * (reference src/job.py:23). */
  val measureCandidates: Seq[String] =
    Seq("quantity", "qty", "cantidad", "amount")

  /** All numeric columns of a schema, in field order — the Spark analog of
    * the reference's information_schema.columns probe
    * (reference src/job.py:135-140). */
  def numericColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** Pick the measure column: first candidate present (case-insensitive),
    * else the first numeric column, else None
    * (reference src/job.py:145-152). */
  def detectMeasureColumn(
      schema: StructType,
      candidates: Seq[String] = measureCandidates): Option[String] = {
    val numeric = numericColumns(schema)
    val lower = numeric.map(c => c.toLowerCase -> c).toMap
    candidates.collectFirst {
      case c if lower.contains(c.toLowerCase) => lower(c.toLowerCase)
    }.orElse(numeric.headOption)
  }
}
