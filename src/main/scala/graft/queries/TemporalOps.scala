package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Temporal joins — the two operators every event-stream warehouse needs
  * that Spark does not ship natively: the AS-OF join (latest right row at
  * or before each left row, per key) and the unkeyed INTERVAL-OVERLAP
  * join. Both are spelled as compositions whose shuffle shape survives
  * 100 TB: the as-of join is ONE union + ONE key-partitioned window (no
  * per-key loop, no row explosion), and the interval join is a
  * grid-bucketed EQUI-join (never a nested-loop) with an owner-cell rule
  * so no pair is emitted twice. DuckDB has both operators natively
  * (ASOF JOIN; efficient range joins), which makes the oracles honest:
  * the engine must reproduce a real temporal-join semantics, not a
  * hand-rolled approximation of one.
  *
  * Determinism: all time arithmetic is integer epoch-micros / epoch-day
  * keys (`unix_micros` ÷ floors — both engines floor the same integers);
  * the right side of the as-of join is pre-aggregated to one row per
  * (key, instant) so tie-breaking never depends on engine row order.
  */
object TemporalOps {

  /** AS-OF join (point-in-time lookup): for every purchase event, the
    * user's latest click at or before it — the market-data/SCD lookup
    * primitive (kdb `aj`, pandas `merge_asof`, DuckDB `ASOF JOIN`).
    *
    * Not a duplicate of `q_asof_prior_click` (RelOps): that is the
    * single-TABLE prior-instant window (strictly-before semantics, only
    * the prior timestamp surfaces, oracle = the same window spelling).
    * This is the two-RELATION operator: the right side is its own keyed
    * relation whose PAYLOAD columns (click_id and instant) are carried
    * to the left row, matching is the standard inclusive `>=` ASOF
    * semantics, and the oracle is DuckDB's native `ASOF LEFT JOIN` — an
    * independently-implemented temporal-join engine the composition
    * must value-match, not a re-spelling of itself.
    *
    * Composition, not per-key code: tag clicks side=0 and purchases
    * side=1, union, and carry `last(click struct, ignoreNulls)` over a
    * window PARTITIONed BY user_id ORDERed BY (t, side, event_id) — each
    * purchase row sees exactly the latest click with click.t ≤ its t
    * (side 0 sorts before side 1 at equal t, giving the ASOF `>=`
    * inclusive semantics). One shuffle on user_id; the window partitions
    * on a data-scaled key (bounded per-user history, scale-safe — the
    * q_interval_merge posture), vs. the naive equi-join + argmax which
    * explodes every (purchase × earlier-click) pair first. Clicks are
    * pre-aggregated to one row per (user, instant) (MAX event_id) so the
    * carried row is well-defined under timestamp ties in both engines.
    * Purchases with no prior click keep NULL click columns (ASOF LEFT). */
  val qAsofJoin: Q = Q("q_asof_join",
    """WITH p AS (SELECT user_id, event_id,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, t, MAX(event_id) AS click_id FROM
      |        (SELECT user_id, event_id,
      |           epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |         FROM events WHERE event_type = 'click')
      |      GROUP BY user_id, t)
      |SELECT p.user_id, p.event_id AS purchase_id, p.t AS purchase_us,
      |       c.click_id, c.t AS click_us, p.t - c.t AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.t >= c.t
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "t").agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "t")
    val tagged = clicks
      .select(col("user_id"), col("t"), lit(0).as("side"),
        col("click_id"), lit(null).cast("long").as("event_id"))
      .unionByName(purchases
        .select(col("user_id"), col("t"), lit(1).as("side"),
          lit(null).cast("long").as("click_id"), col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy("t", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("cf",
        last(when(col("side") === 0,
          struct(col("t").as("ct"), col("click_id"))), ignoreNulls = true)
          .over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("t").as("purchase_us"), col("cf.click_id").as("click_id"),
        col("cf.ct").as("click_us"),
        (col("t") - col("cf.ct")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Grid cell size for [[qIntervalJoin]], in days: near the typical
    * interval length, so each interval covers ≤ 2 cells and each
    * candidate pair shares O(1) cells. */
  val CellDays = 16L

  /** Unkeyed INTERVAL-OVERLAP join: all (urgent × low-priority)
    * high-value order pairs whose availability windows intersect —
    * the campaign-overlap / conflict-detection primitive.
    *
    * The scale shape is the standard grid bucketing: each interval
    * explodes into the ≤ ⌈len/cell⌉+1 grid cells it covers, candidates
    * meet in an EQUI-join on the cell key (hash-partitioned, never a
    * nested-loop — PlanShapeSpec pins the plan), and the exact overlap
    * predicate then filters false cell-neighbours. A pair sharing
    * several cells would be emitted once per shared cell, so only the
    * OWNER cell — the one containing max(a.start, b.start), which every
    * overlapping pair has exactly one of — emits it: dedup by
    * arithmetic, not an extra DISTINCT shuffle. The oracle spells the
    * plain quadratic range join (DuckDB plans it as its native interval
    * join); results are value-identical, integer epoch-day arithmetic
    * end to end. */
  val qIntervalJoin: Q = Q("q_interval_join",
    """WITH a AS (SELECT o_orderkey AS a_key,
      |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS s,
      |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
      |          + 1 + o_orderkey % 13 AS e
      |      FROM orders WHERE o_orderpriority = '1-URGENT'
      |        AND o_totalprice > 250000),
      |b AS (SELECT o_orderkey AS b_key,
      |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS s,
      |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
      |          + 1 + o_orderkey % 13 AS e
      |      FROM orders WHERE o_orderpriority = '5-LOW'
      |        AND o_totalprice > 250000)
      |SELECT a.a_key, b.b_key,
      |  CAST(GREATEST(a.s, b.s) AS BIGINT) AS ov_start,
      |  CAST(LEAST(a.e, b.e) AS BIGINT) AS ov_end,
      |  CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS BIGINT)
      |    AS ov_days
      |FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
      |ORDER BY a_key, b_key""".stripMargin) { (s, d) =>
    val dk = expr(
      "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    def side(priority: String, p: String) =
      Tables.load(s, d, "orders")
        .filter(col("o_orderpriority") === priority &&
          col("o_totalprice") > 250000)
        .select(col("o_orderkey").as(s"${p}_key"), dk.as("s"),
          (dk + lit(1) + pmod(col("o_orderkey"), lit(13))).as("e"))
    def withCells(df: org.apache.spark.sql.DataFrame, p: String) =
      df.select(col(s"${p}_key"), col("s").as(s"${p}_s"),
          col("e").as(s"${p}_e"),
          explode(sequence(expr(s"s div $CellDays"),
            expr(s"e div $CellDays"))).as("cell"))
    val a = withCells(side("1-URGENT", "a"), "a")
    val b = withCells(side("5-LOW", "b"), "b")
    a.join(b, Seq("cell"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        // owner-cell rule: emit only in the cell of max(a_s, b_s)
        col("cell") === expr(s"greatest(a_s, b_s) div $CellDays"))
      .select(col("a_key"), col("b_key"),
        greatest(col("a_s"), col("b_s")).cast("long").as("ov_start"),
        least(col("a_e"), col("b_e")).cast("long").as("ov_end"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s"))
          + 1).cast("long").as("ov_days"))
      .orderBy("a_key", "b_key")
  }

  val all: Seq[Q] = Seq(qAsofJoin, qIntervalJoin)
}
