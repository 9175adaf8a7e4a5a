package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The curation engine (SURVEY.md §2.11, reference src/job.py:159-258).
  *
  * Reference semantics, re-expressed as a pure DataFrame transform:
  *   1. detect the measure ("quantity") column from schema metadata
  *      (src/job.py:131-157);
  *   2. cast a string date column to DATE with the permissive
  *      'yyyy/MM/dd' pattern (src/job.py:186-188) — Spark's bare CAST
  *      rejects slashes, so `to_date(col, "yyyy/MM/dd")` reproduces the
  *      Postgres `daily::date` path; the regex-guarded fallback
  *      (src/job.py:195-206) is subsumed;
  *   3. split rows on the validity predicate
  *      `q IS NULL OR q <= 0 OR q > 1000000` (src/job.py:222-247) into
  *      clean / quarantined sets instead of a destructive DELETE — the
  *      quarantined set is what the reference backs up then deletes.
  *
  * Everything is lazy and distributed: the predicate is a Catalyst filter
  * (pushed into the scan), the split shares one scan under Spark's plan
  * cache, and no row ever reaches the driver.
  */
object Curation {

  val MaxValidQuantity: Long = 1000000L // reference src/job.py:225,243

  /** The reference's row-validity predicate P1 (src/job.py:225). */
  def invalidMeasure(c: Column): Column =
    c.isNull || c <= 0 || c > MaxValidQuantity

  /** Permissive string→date cast F3 (src/job.py:186-188). */
  def parseSlashedDate(c: Column): Column = to_date(c, "yyyy/MM/dd")

  /** Regex-guarded fallback cast — reference's dead-on-shipped-data path
    * (src/job.py:195-206), kept as documented semantics: dash-separated
    * strings parse, anything else nulls. */
  def parseDashDateGuarded(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"), to_date(c, "yyyy-MM-dd"))
      .otherwise(lit(null).cast("date"))

  final case class CurationResult(
      clean: DataFrame,
      quarantined: DataFrame,
      measureColumn: String)

  /** Curate a fact table: optional date normalization + validity split.
    *
    * @param dateColumn string column holding 'yyyy/MM/dd' dates to be
    *                   rewritten in place as DATE (reference D2); None if
    *                   the table has no such column.
    * @param measureColumn explicit measure column; detected from the schema
    *                   when None (reference src/job.py:145-152).
    */
  def curate(df: DataFrame, dateColumn: Option[String] = None,
      measureColumn: Option[String] = None): CurationResult = {
    val dated = dateColumn match {
      case Some(d) => df.withColumn(d, parseSlashedDate(col(d)))
      case None    => df
    }
    val measure = measureColumn
      .orElse(Schemas.detectMeasureColumn(dated.schema))
      .getOrElse(throw new IllegalArgumentException(
        s"no numeric column to curate in schema ${dated.schema.simpleString}"))
    val bad = invalidMeasure(col(measure))
    CurationResult(dated.filter(!bad), dated.filter(bad), measure)
  }

  /** The reference's before/after count verification (D5,
    * src/job.py:249-258) as SINGLE-PASS pipeline telemetry: the clean
    * frame comes back instrumented with a named `Observation` that
    * accumulates total / invalid / null-measure counts WHILE the first
    * action on the frame runs — no second scan, no separate COUNT
    * queries, no driver-side collect. At 100 TB this is the difference
    * between "verify" costing one extra full-table pass and costing
    * nothing: the metrics ride the task completion events.
    *
    * Usage: run any action on `clean` (write it, count it), then read
    * `observation.get` — keys `n_total`, `n_invalid`, `n_null_measure`
    * satisfy `clean.count() == n_total - n_invalid` (spec-asserted). */
  def curateObserved(df: DataFrame, dateColumn: Option[String] = None,
      measureColumn: Option[String] = None)
      : (DataFrame, org.apache.spark.sql.Observation, String) = {
    val dated = dateColumn match {
      case Some(d) => df.withColumn(d, parseSlashedDate(col(d)))
      case None    => df
    }
    val measure = measureColumn
      .orElse(Schemas.detectMeasureColumn(dated.schema))
      .getOrElse(throw new IllegalArgumentException(
        s"no numeric column to curate in schema ${dated.schema.simpleString}"))
    val bad = invalidMeasure(col(measure))
    val obs = org.apache.spark.sql.Observation("curation")
    val observed = dated.observe(obs,
      count(lit(1)).as("n_total"),
      sum(when(bad, 1L).otherwise(0L)).as("n_invalid"),
      sum(when(col(measure).isNull, 1L).otherwise(0L))
        .as("n_null_measure"))
    (observed.filter(!bad), obs, measure)
  }
}
