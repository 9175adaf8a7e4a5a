package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.curate.Curation
import graft.io.Tables
import graft.model.Schemas

/** The reference's four analytic queries (reference sql/queries.sql:1-33)
  * plus its curation/count behaviors (src/job.py:114-258), re-expressed on
  * the driver testdata star schema (sellout≈lineitem, products≈part,
  * stores/chains≈supplier/nation — FIXTURES.md §B mapping).
  *
  * Scale posture: the fact table (`lineitem`) is never collected; dimension
  * sides are explicitly `broadcast()` so the 100 TB plan is a scan +
  * broadcast-hash-join + partial/final hash aggregate with no fact shuffle
  * before aggregation. Every output is totally ordered (deterministic
  * tiebreaks per SURVEY.md §2.5 ⚠) so oracle diffs are exact.
  */
object RefQueries {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")

  /** Q1 — units per week (reference sql/queries.sql:1-5, A1/F1/O1).
    * `date_trunc('week', …)` is Monday-start in both Spark and Postgres;
    * cast to DATE so Spark and the DuckDB oracle agree on type. Sum cast to
    * long: quantities are integer-valued. */
  val q1WeeklyUnits: Q = Q("q1_weekly_units",
    """SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS semana,
      |       CAST(SUM(l_quantity) AS BIGINT) AS unidades
      |FROM lineitem GROUP BY 1 ORDER BY semana""".stripMargin) { (s, d) =>
    li(s, d)
      .groupBy(to_date(date_trunc("week", col("l_shipdate"))).as("semana"))
      .agg(sum("l_quantity").cast("long").as("unidades"))
      .orderBy("semana")
  }

  /** Q2 — top-5 products by units (reference sql/queries.sql:7-13,
    * J1/A2/O2). 80-row dim → broadcast join; `p_name` tiebreak makes the
    * LIMIT deterministic. Catalyst plans TakeOrderedAndProject (true top-k,
    * no global sort). */
  val q2TopProducts: Q = Q("q2_top_products",
    """SELECT p.p_name AS product_name,
      |       CAST(SUM(l.l_quantity) AS BIGINT) AS unidades
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1 ORDER BY unidades DESC, product_name LIMIT 5""".stripMargin) {
    (s, d) =>
      li(s, d)
        .join(broadcast(Tables.load(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_name").as("product_name"))
        .agg(sum("l_quantity").cast("long").as("unidades"))
        .orderBy(desc("unidades"), asc("product_name"))
        .limit(5)
  }

  /** Q3 — top-5 nation/supplier by units (reference sql/queries.sql:15-22,
    * J2/A3/O2): two chained broadcast hash joins, no fact shuffle. */
  val q3TopSuppliers: Q = Q("q3_top_suppliers",
    """SELECT n.n_name AS nation_name, s.s_name AS supplier_name,
      |       CAST(SUM(l.l_quantity) AS BIGINT) AS unidades
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2
      |ORDER BY unidades DESC, nation_name, supplier_name
      |LIMIT 5""".stripMargin) { (s, d) =>
    li(s, d)
      .join(broadcast(Tables.load(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"),
        col("s_name").as("supplier_name"))
      .agg(sum("l_quantity").cast("long").as("unidades"))
      .orderBy(desc("unidades"), asc("nation_name"), asc("supplier_name"))
      .limit(5)
  }

  /** Q4 — seasonality: units per nation × weekday (reference
    * sql/queries.sql:24-33, A4/F2/O3). Engine semantics: unpadded English
    * day names (`date_format 'EEEE'` ≡ DuckDB `dayname`), per SURVEY.md
    * §2.7 F2 — not Postgres TO_CHAR's 9-char blank padding. */
  val q4WeekdaySeasonality: Q = Q("q4_weekday_seasonality",
    """SELECT n.n_name AS nation_name, dayname(l.l_shipdate) AS dia_semana,
      |       CAST(SUM(l.l_quantity) AS BIGINT) AS unidades
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2
      |ORDER BY nation_name, unidades DESC, dia_semana""".stripMargin) {
    (s, d) =>
      li(s, d)
        .join(broadcast(Tables.load(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation_name"),
          date_format(col("l_shipdate"), "EEEE").as("dia_semana"))
        .agg(sum("l_quantity").cast("long").as("unidades"))
        .orderBy(asc("nation_name"), desc("unidades"), asc("dia_semana"))
  }

  /** Curation D4: the clean side of the validity split on the detected
    * measure column (l_quantity — first "quantity"-like numeric per
    * src/job.py:145-152 falls through to candidates miss → l_orderkey would
    * be wrong, so the fact-table adapter names the measure explicitly,
    * mirroring how the reference pins sellout.quantity). Full row output,
    * keyed order. */
  val qCurateClean: Q = Q("q_curate_clean",
    """SELECT * FROM lineitem
      |WHERE NOT (l_quantity IS NULL OR l_quantity <= 0
      |           OR l_quantity > 1000000)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Curation.curate(li(s, d), measureColumn = Some("l_quantity"))
      .clean.orderBy("l_orderkey", "l_linenumber")
  }

  /** Curation D5: before/after count invariants, one row
    * (reference src/job.py:302-311). */
  val qCurateStats: Q = Q("q_curate_stats",
    """SELECT COUNT(*) AS rows_in,
      |  COUNT(*) FILTER (WHERE l_quantity IS NULL OR l_quantity <= 0
      |                   OR l_quantity > 1000000) AS rows_removed,
      |  COUNT(*) FILTER (WHERE NOT (l_quantity IS NULL OR l_quantity <= 0
      |                   OR l_quantity > 1000000)) AS rows_out
      |FROM lineitem""".stripMargin) { (s, d) =>
    val bad = Curation.invalidMeasure(col("l_quantity"))
    li(s, d).agg(
      count(lit(1)).as("rows_in"),
      count(when(bad, 1)).as("rows_removed"),
      count(when(!bad, 1)).as("rows_out"))
  }

  /** Curation D3/D4 — the quarantined side with machine-readable reasons
    * (what the reference backs up then DELETEs).
    *
    * The TPC-H-ish corpus is CLEAN, so quarantining it directly emits 0
    * rows at every SF and the oracle gate was VACUOUS — empty-vs-empty
    * hashes match even if the validity split breaks (VERDICT r6 wrong
    * #1). The registered gate therefore feeds [[Curation.curate]] a
    * DETERMINISTICALLY PERTURBED fact (the same CASE in both engines:
    * orderkey%97 → NULL, %89 → negated, %83 → +2,000,000) so every
    * reason branch — null / nonpositive / overflow — is value-gated
    * with real rows (~1.9k at sf0.01). The reference's actual on-clean
    * behavior (an EMPTY quarantine) stays verified by [[qCurateStats]]'s
    * rows_removed = 0 and by CurationSpec's 6,334-row golden split on
    * the reference's own data. */
  val qCurateQuarantine: Q = Q("q_curate_quarantine",
    """WITH pert AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_orderkey % 97 = 0 THEN NULL
      |         WHEN l_orderkey % 89 = 0 THEN -l_quantity
      |         WHEN l_orderkey % 83 = 0 THEN l_quantity + 2000000
      |         ELSE l_quantity END AS l_quantity
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, l_quantity,
      |  CASE WHEN l_quantity IS NULL THEN 'null'
      |       WHEN l_quantity <= 0 THEN 'nonpositive'
      |       ELSE 'overflow' END AS reason
      |FROM pert
      |WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 1000000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val pert = li(s, d).select(col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 97 === 0, lit(null).cast("double"))
        .when(col("l_orderkey") % 89 === 0, -col("l_quantity"))
        .when(col("l_orderkey") % 83 === 0, col("l_quantity") + 2000000)
        .otherwise(col("l_quantity")).as("l_quantity"))
    Curation.curate(pert, measureColumn = Some("l_quantity"))
      .quarantined
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        when(col("l_quantity").isNull, "null")
          .when(col("l_quantity") <= 0, "nonpositive")
          .otherwise("overflow").as("reason"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** S3 — COUNT(*) per expected table (reference src/job.py:114-129).
    * One unioned job (count stages run concurrently across tables), not a
    * driver loop of sequential count() actions. */
  val qTableCounts: Q = Q("q_table_counts",
    Schemas.testTables.sorted
      .map(t => s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
      .mkString("", " UNION ALL ", " ORDER BY table_name")) { (s, d) =>
    Schemas.testTables.sorted
      .map(t => Tables.load(s, d, t)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows")))
      .reduce(_ unionAll _)
      .orderBy("table_name")
  }

  /** F3/D2 — permissive 'yyyy/MM/dd' string→date cast round-trip
    * (reference src/job.py:186-188; SURVEY.md §2.2 P3 landmine: Spark's
    * bare CAST rejects slashes, to_date with a pattern is the correct
    * translation). Demonstrated by rendering each ship date to the
    * reference's raw format and parsing it back. */
  val qDateCastRoundtrip: Q = Q("q_date_cast_roundtrip",
    """SELECT l_orderkey, l_linenumber,
      |       strftime(l_shipdate, '%Y/%m/%d') AS daily_raw,
      |       CAST(strptime(strftime(l_shipdate, '%Y/%m/%d'), '%Y/%m/%d')
      |            AS DATE) AS daily,
      |       CAST(NULL AS DATE) AS daily_fallback
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
    (s, d) =>
      val raw = date_format(col("l_shipdate"), "yyyy/MM/dd")
      li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        raw.as("daily_raw"),
        Curation.parseSlashedDate(raw).as("daily"),
        // the reference's dash-only fallback nulls slashed input (dead
        // path on its own data, src/job.py:195-206) — kept as semantics:
        Curation.parseDashDateGuarded(raw).as("daily_fallback"))
        .orderBy("l_orderkey", "l_linenumber")
  }

  /** §1.2 schema introspection: numeric-column discovery + measure-column
    * election for the fact table, as data (reference src/job.py:131-157).
    * Pure driver-side schema reflection; oracle is the expected literal. */
  val qNumericColumns: Q = Q("q_numeric_columns",
    """SELECT * FROM (VALUES
      |  ('l_orderkey', 1, FALSE), ('l_partkey', 2, FALSE),
      |  ('l_suppkey', 3, FALSE), ('l_linenumber', 4, FALSE),
      |  ('l_quantity', 5, TRUE), ('l_extendedprice', 6, FALSE),
      |  ('l_discount', 7, FALSE), ('l_tax', 8, FALSE))
      |  AS t(column_name, ordinal, is_measure)
      |ORDER BY ordinal""".stripMargin) { (s, d) =>
    import s.implicits._
    val schema = li(s, d).schema
    val measure = Schemas.detectMeasureColumn(
      schema, Schemas.measureCandidates :+ "l_quantity")
    Schemas.numericColumns(schema).zipWithIndex
      .map { case (c, i) => (c, i + 1, measure.contains(c)) }
      .toDF("column_name", "ordinal", "is_measure")
      .orderBy("ordinal")
  }

  val all: Seq[Q] = Seq(
    q1WeeklyUnits, q2TopProducts, q3TopSuppliers, q4WeekdaySeasonality,
    qCurateClean, qCurateStats, qCurateQuarantine, qTableCounts,
    qDateCastRoundtrip, qNumericColumns)
}
