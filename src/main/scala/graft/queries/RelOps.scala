package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Relational operator surface beyond the reference's four queries: the
  * join/set/window/grouping machinery a user of the reference would need as
  * the pipeline grows (SURVEY.md §2.3-§2.8 mark these absent in the
  * reference; they are first-class here).
  *
  * Money columns travel as integer cents (`round(x*100)::bigint`): exact,
  * order-independent, engine-agnostic — a double SUM's value depends on
  * reduction order, so two correct engines would disagree in the last bits.
  *
  * Scale notes are per-operator; the common posture: fact tables only ever
  * shuffle on their aggregation/join keys, dims broadcast, windows
  * partition by high-cardinality keys (never a global window over raw
  * rows).
  */
object RelOps {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  /** Semi join: orders having at least one near-capacity line. Left-semi
    * avoids materializing the join product — at 100 TB this is a broadcast
    * or shuffled-hash existence probe, never a fan-out. */
  val qSemiJoin: Q = Q("q_semi_join",
    """SELECT o_orderkey, o_orderstatus,
      |       CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "lineitem").filter(col("l_quantity") >= 48),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("total_cents"))
      .orderBy("o_orderkey")
  }

  /** Anti join (NOT EXISTS → left_anti): parts never sold at
    * near-capacity quantity (≥ 45). The bare "never sold at all"
    * spelling emitted 0 rows at every test SF (every part has at least
    * one lineitem), making the oracle gate VACUOUS — empty-vs-empty
    * hashes match no matter what the anti-join does (VERDICT r6 wrong
    * #1). The existence predicate on the probed side keeps the identical
    * anti-join plan (the filter rides the fact scan) while the output is
    * non-empty (~53 parts at sf0.01), so a broken anti-join actually
    * mismatches. */
  val qAntiJoin: Q = Q("q_anti_join",
    """SELECT p_partkey, p_name FROM part WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey AND l_quantity >= 45)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.load(s, d, "part")
      .join(Tables.load(s, d, "lineitem").filter(col("l_quantity") >= 45),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** Outer join + aggregate: units per part including never-sold parts.
    * Aggregate-before-join: the fact table collapses to ≤|part| rows
    * *before* the outer join, so the join moves aggregates, not raw fact
    * rows — the shape that survives a 100× fact scale-up (joining first
    * would fan the fact table through the join and cannot broadcast: build
    *-left on a left-outer join is unsupported). */
  val qOuterJoinAgg: Q = Q("q_outer_join_agg",
    """SELECT p.p_partkey, p.p_name,
      |       COALESCE(CAST(SUM(l.l_quantity) AS BIGINT), 0) AS units
      |FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
      |GROUP BY 1, 2 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val perPart = Tables.load(s, d, "lineitem")
      .groupBy("l_partkey")
      .agg(sum("l_quantity").cast("long").as("units_raw"))
    Tables.load(s, d, "part")
      .join(perPart, col("p_partkey") === col("l_partkey"), "left")
      .select(col("p_partkey"), col("p_name"),
        coalesce(col("units_raw"), lit(0L)).as("units"))
      .orderBy("p_partkey")
  }

  /** UNION ALL with provenance tag (the reference's fact table arrives
    * pre-combined from per-chain feeds — SURVEY.md §2.6; this is that
    * upstream combine step as an operator). */
  val qUnionAllNames: Q = Q("q_union_all_names",
    """SELECT name, src FROM (
      |  SELECT c_name AS name, 'customer' AS src FROM customer
      |  UNION ALL
      |  SELECT s_name AS name, 'supplier' AS src FROM supplier)
      |ORDER BY name, src""".stripMargin) { (s, d) =>
    Tables.load(s, d, "customer")
      .select(col("c_name").as("name"), lit("customer").as("src"))
      .unionAll(Tables.load(s, d, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("src")))
      .orderBy("name", "src")
  }

  /** INTERSECT / EXCEPT (distinct set semantics in both engines). */
  val qSetIntersectExcept: Q = Q("q_set_intersect_except",
    """SELECT 'both' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'customer_only' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY op, nationkey""".stripMargin) { (s, d) =>
    val c = Tables.load(s, d, "customer")
      .select(col("c_nationkey").as("nationkey"))
    val sup = Tables.load(s, d, "supplier")
      .select(col("s_nationkey").as("nationkey"))
    c.intersect(sup).select(lit("both").as("op"), col("nationkey"))
      .unionAll(c.except(sup)
        .select(lit("customer_only").as("op"), col("nationkey")))
      .orderBy("op", "nationkey")
  }

  /** Ranking window: top-3 suppliers per nation by units. The window
    * partitions by nation — parallel across partitions, no global sort.
    * (The reference's "mejor/peor día" is a plain sort, SURVEY.md §2.8;
    * this is the window upgrade.) */
  val qWindowRank: Q = Q("q_window_rank",
    """SELECT nation_name, supplier_name, units, rnk FROM (
      |  SELECT n.n_name AS nation_name, s.s_name AS supplier_name,
      |         CAST(SUM(l.l_quantity) AS BIGINT) AS units,
      |         CAST(ROW_NUMBER() OVER (
      |           PARTITION BY n.n_name
      |           ORDER BY CAST(SUM(l.l_quantity) AS BIGINT) DESC, s.s_name)
      |           AS BIGINT) AS rnk
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2) t
      |WHERE rnk <= 3 ORDER BY nation_name, rnk""".stripMargin) { (s, d) =>
    val agg = Tables.load(s, d, "lineitem")
      .join(broadcast(Tables.load(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"),
        col("s_name").as("supplier_name"))
      .agg(sum("l_quantity").cast("long").as("units"))
    val w = Window.partitionBy("nation_name")
      .orderBy(desc("units"), asc("supplier_name"))
    agg.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("nation_name", "rnk")
  }

  /** Running-total window: cumulative spend per customer in order-date
    * order. Partitioned by customer — distributes on the natural key. */
  val qWindowRunning: Q = Q("q_window_running",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
      |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS running_cents
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""
      .stripMargin) { (s, d) =>
    val pc = cents(col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        pc.as("price_cents"))
      .withColumn("running_cents", sum("price_cents").over(w))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Lag window: day-over-day delta of shipped units. The window is global
    * but over the *daily aggregate* (cardinality = distinct days), never
    * the raw fact — bounded single-partition work at any scale. */
  val qWindowLagDelta: Q = Q("q_window_lag_delta",
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS d,
      |         CAST(SUM(l_quantity) AS BIGINT) AS units
      |  FROM lineitem GROUP BY 1)
      |SELECT d, units, units - LAG(units) OVER (ORDER BY d) AS delta
      |FROM daily ORDER BY d""".stripMargin) { (s, d) =>
    val daily = Tables.load(s, d, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum("l_quantity").cast("long").as("units"))
    daily.withColumn("delta",
      col("units") - lag("units", 1).over(Window.orderBy("d")))
      .orderBy("d")
  }

  /** ROLLUP: units by returnflag ⊃ linestatus ⊃ grand total, with a
    * grouping id. Partial aggregation happens once; rollup levels are
    * derived without rescanning. */
  val qRollup: Q = Q("q_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      |       COALESCE(l_linestatus, 'ALL') AS lstatus,
      |       CAST(SUM(l_quantity) AS BIGINT) AS units,
      |       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INT)
      |         AS gid
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, rflag, lstatus""".stripMargin) { (s, d) =>
    Tables.load(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").cast("long").as("units"),
        (grouping(col("l_returnflag")) * 2 +
          grouping(col("l_linestatus"))).cast("int").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("units"), col("gid"))
      .orderBy("gid", "rflag", "lstatus")
  }

  /** CUBE: order counts + revenue cents across all subsets of
    * (orderstatus, orderpriority). */
  val qCube: Q = Q("q_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |         AS revenue_cents
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.load(s, d, "orders")
      .withColumn("price_cents", cents(col("o_totalprice")))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum("price_cents").as("revenue_cents"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue_cents"))
      .orderBy("status", "priority")
  }

  /** DISTINCT aggregation: part breadth + units per supplier. */
  val qDistinctAgg: Q = Q("q_distinct_agg",
    """SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(SUM(l_quantity) AS BIGINT) AS units
      |FROM lineitem GROUP BY 1 ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    Tables.load(s, d, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("n_parts"),
        sum("l_quantity").cast("long").as("units"))
      .orderBy("l_suppkey")
  }

  /** Exact distinct via the bitmap OR-merge aggregator
    * ([[graft.functions.BitmapDistinctAgg]]) — the OLAP bitmap-index
    * accelerator next to [[qDistinctAgg]]'s COUNT(DISTINCT): where
    * COUNT(DISTINCT x) shuffles every distinct (group, x) pair, the
    * bitmap ships ONE fixed-size state per (partition, group) and ORs —
    * the distinct-count analog of map-side combine, exact (not a
    * sketch), repartition-invariant (spec-pinned). The oracle is plain
    * COUNT(DISTINCT): the whole point is that the accelerator's answer
    * is bit-identical to the naive spelling.
    *
    * Domain sizing (r8, VERDICT r7 next #6 — no more fixed SF ceiling;
    * rebased r9 per ADVICE): the query derives the bitmap domain from
    * TABLE STATS at build — one bounded min/max probe over the two key
    * columns (column-pruned scan, single driver row) sizes each words
    * array to that column's actual RANGE (max−min+1), with the key
    * REBASED by its min so a keyspace starting at 10⁹ still gets a
    * tight bitmap. An empty table (null min/max) falls back to
    * COUNT(DISTINCT) instead of NPE-ing on the aggregate row.
    * Past [[graft.functions.BitmapDistinctAgg.MaxDomain]] (2^26 bits =
    * 8 MiB of mergeable state per group — the memory bound where a
    * dense bitmap stops being the right tool) the plan falls back to
    * COUNT(DISTINCT), so the query is correct at ANY scale: dense-small
    * domains get the accelerator, unbounded domains get the exact
    * shuffle (or [[graft.text.TextOps]]' HLL sketch when approximate is
    * acceptable). The SQL-registered `bitmap_distinct` keeps the fixed
    * [[graft.functions.BitmapDistinctAgg.SqlDomain]] = 2^20 (a SQL
    * function signature cannot probe stats) and fails fast past it. */
  val qBitmapDistinct: Q = Q("q_bitmap_distinct",
    """SELECT l_returnflag,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |       COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      val li = Tables.load(s, d, "lineitem")
      val st = li.agg(
        min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long"),
        min(col("l_suppkey")).cast("long"), max(col("l_suppkey")).cast("long"))
        .head()
      // per-column (rebase, range): a null min/max (empty table) takes
      // the COUNT(DISTINCT) fallback via domain 0
      def keyCol(c: String, lo: Int, hi: Int): (Column, Long) =
        if (st.isNullAt(lo)) (col(c), 0L)
        else (col(c) - lit(st.getLong(lo)),
          st.getLong(hi) - st.getLong(lo) + 1)
      val (pk, pDom) = keyCol("l_partkey", 0, 1)
      val (sk, sDom) = keyCol("l_suppkey", 2, 3)
      val sized = graft.functions.BitmapDistinctAgg.sizedDistinct _
      li.groupBy("l_returnflag")
        .agg(sized(pk, pDom).as("n_parts"),
          sized(sk, sDom).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
  }

  /** Top-k without global sort: Catalyst's TakeOrderedAndProject keeps a
    * per-partition heap of k rows, then merges — O(n) scan, O(k) state. */
  val qTopkOrders: Q = Q("q_topk_orders",
    """SELECT o_orderkey, o_custkey,
      |       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
      |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10"""
      .stripMargin) { (s, d) =>
    Tables.load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy(desc("price_cents"), asc("o_orderkey"))
      .limit(10)
  }

  /** JSON extraction (events.props is a JSON string): per-type sum of the
    * extracted "k" field. */
  val qJsonExtract: Q = Q("q_json_extract",
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |            AS BIGINT) AS sum_k,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast("long"))
        .as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Batch sessionization: 30-minute inactivity gap splits a user's events
    * into sessions (lag → gap flag → running sum = session seq). All
    * windows partition by user_id — shuffles once on the session key. */
  val qSessionize: Q = Q("q_sessionize",
    """WITH gaps AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM gaps)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |       MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_seq"""
      .stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    Tables.load(s, d, "events")
      .withColumn("new_session",
        when(gapUs > 1800000000L || gapUs.isNull, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .orderBy("user_id", "session_seq")
  }

  /** Session windows via the built-in `session_window` expression (the
    * declarative spelling of [[qSessionize]]'s lag/running-sum pipeline;
    * also the expression the streaming path would use). Semantics: events
    * merge while the gap is STRICTLY under 30 minutes (session windows
    * are end-exclusive); the emitted end is last event + gap. The oracle
    * derives the same sessions with a >= gap split and MAX(ts) + 30 min. */
  val qSessionWindow: Q = Q("q_session_window",
    """WITH gaps AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
      |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM gaps)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Tumbling time window (batch twin of the streaming hourly aggregate —
    * graft.streaming uses the same `window()` expression on readStream). */
  val qTumblingHour: Q = Q("q_tumbling_hour",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
      |         AS value_cents
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""
      .stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .withColumn("value_cents_row", cents(col("value")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_cents_row").as("value_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("value_cents"))
      .orderBy("hour_start", "event_type")
  }

  /** Sliding (hopping) time window in BATCH — 1 h window every 15 min,
    * so each event lands in exactly 4 windows (batch twin of
    * [[graft.streaming.StreamOps.slidingCounts]], same `window()`
    * generator expression). Window starts are emitted as integer epoch
    * SECONDS: the generator's start timestamps pass through
    * `unix_micros`, sidestepping any cross-engine timestamp rendering
    * while staying value-exact. The oracle expands the 4 per-event
    * window starts arithmetically — `(es div 900 − k)·900` for
    * k ∈ 0..3 — which is the identity the generator implements; the
    * replication factor is window/slide, a constant, so the expanded
    * frame is 4× events, map-side combined before the shuffle. */
  val qSlidingQuarter: Q = Q("q_sliding_quarter",
    """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es,
      |             user_id FROM events),
      |w AS (SELECT ((es // 900) - k.k) * 900 AS win_start_s, user_id
      |      FROM ev CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k))
      |SELECT CAST(win_start_s AS BIGINT) AS win_start_s, COUNT(*) AS n,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).cast("long").as("n_users"))
      .select(expr("unix_micros(CAST(window.start AS TIMESTAMP))" +
          " div 1000000").cast("long").as("win_start_s"),
        col("n"), col("n_users"))
      .orderBy("win_start_s")
  }

  /** As-of join (time-series point-in-time lookup, absent from both the
    * reference and Spark's built-ins): for each purchase, the latest prior
    * click of the same user — expressed as an IGNORE NULLS last-value
    * window, which shuffles once on user_id instead of a range join. */
  val qAsofPriorClick: Q = Q("q_asof_prior_click",
    """SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
      |       prior_click_ts
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prior_click_ts
      |  FROM events) t
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, d, "events")
      .withColumn("prior_click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts"), col("prior_click_ts"))
      .orderBy("user_id", "purchase_event_id")
  }

  /** As-of join with a tolerance bound: like [[qAsofPriorClick]] but the
    * match expires after 60 minutes — the point-in-time lookup shape of
    * feature stores ("latest signal no older than X"). */
  val qAsofTolerance: Q = Q("q_asof_tolerance",
    """SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
      |  CASE WHEN epoch_us(ts) - epoch_us(prior_click_ts) <= 3600000000
      |       THEN prior_click_ts END AS click_within_1h
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prior_click_ts
      |  FROM events) t
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = last(when(col("event_type") === "click", col("ts")),
      ignoreNulls = true).over(w)
    Tables.load(s, d, "events")
      .withColumn("prior_click_ts", prior)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts"),
        when(unix_micros(col("ts")) - unix_micros(col("prior_click_ts"))
          <= 3600000000L, col("prior_click_ts")).as("click_within_1h"))
      .orderBy("user_id", "purchase_event_id")
  }

  /** Manual pivot via conditional aggregation (one pass, no shuffle per
    * pivot column). */
  val qPivotConditional: Q = Q("q_pivot_conditional",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS views,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signups,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
      |  COUNT(*) AS total
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    def n(t: String) = count(when(col("event_type") === t, 1))
    Tables.load(s, d, "events")
      .groupBy("user_id")
      .agg(n("click").as("clicks"), n("view").as("views"),
        n("purchase").as("purchases"), n("signup").as("signups"),
        n("error").as("errors"), count(lit(1)).as("total"))
      .orderBy("user_id")
  }

  /** The custom heap-based TopKPerKey operator (graft.plans) under the
    * driver's oracle gate: same result as the window spelling, different
    * physical plan (no per-partition sort). */
  val qTopkPerKeyCustom: Q = Q("q_topk_per_key_custom",
    """SELECT nation_name, supplier_name, units FROM (
      |  SELECT n.n_name AS nation_name, s.s_name AS supplier_name,
      |         CAST(SUM(l.l_quantity) AS BIGINT) AS units,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY n.n_name
      |           ORDER BY CAST(SUM(l.l_quantity) AS BIGINT) DESC, s.s_name)
      |           AS rnk
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2) t
      |WHERE rnk <= 3
      |ORDER BY nation_name, units DESC, supplier_name""".stripMargin) {
    (s, d) =>
      val agg = Tables.load(s, d, "lineitem")
        .join(broadcast(Tables.load(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation_name"),
          col("s_name").as("supplier_name"))
        .agg(sum("l_quantity").cast("long").as("units"))
      graft.plans.TopKPerKey.topKPerKey(agg, Seq("nation_name"),
        Seq("units" -> false, "supplier_name" -> true), 3)
        .orderBy(asc("nation_name"), desc("units"), asc("supplier_name"))
  }

  /** Range join (value ∈ [lo, hi) band lookup) as bucket-equi-join +
    * residual predicate. Spark executes the raw inequality join as a
    * BroadcastNestedLoopJoin — every fact row probes every band, and the
    * moment the band side stops being broadcastable it degrades to a
    * cartesian. The scale-safe spelling decomposes each band into the
    * fixed-width buckets it overlaps (explode — a few rows per band),
    * equi-joins fact rows to buckets (hash join), and applies the exact
    * range bounds as a residual filter. Bucket width trades band fan-out
    * against residual waste; 25.0 keeps the 7-band table at ≤13 buckets
    * per band. Plan-guarded: BroadcastHashJoin, never NestedLoop. */
  val qRangeJoinBands: Q = Q("q_range_join_bands",
    """WITH bands(band_id, lo, hi) AS (
      |  VALUES (0, 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 20.0),
      |         (3, 20.0, 50.0), (4, 50.0, 100.0), (5, 100.0, 200.0),
      |         (6, 200.0, 500.0))
      |SELECT CAST(b.band_id AS INT) AS band_id, b.lo, b.hi,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT)
      |         AS value_cents
      |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
      |GROUP BY 1, 2, 3 ORDER BY band_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = 25.0
    val bands = Seq((0, 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 20.0),
      (3, 20.0, 50.0), (4, 50.0, 100.0), (5, 100.0, 200.0),
      (6, 200.0, 500.0)).toDF("band_id", "lo", "hi")
    val bandBuckets = bands.withColumn("bucket",
      explode(sequence(floor(col("lo") / w), floor(col("hi") / w))))
    Tables.load(s, d, "events")
      .withColumn("bucket", floor(col("value") / w))
      .withColumn("value_cents_row", cents(col("value")))
      .join(broadcast(bandBuckets), "bucket")
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        sum("value_cents_row").as("value_cents"))
      .orderBy("band_id")
  }

  /** Calendar gap-fill + forward fill (the time-series densification
    * step): per key, every day between that key's first and last order
    * exists in the output — missing days carry n = 0 and the last seen
    * daily revenue (LOCF). The calendar is generated per key
    * (`sequence(lo, hi)` exploded — rows bounded by Σ key spans, never a
    * cross join against a global calendar), and the LOCF window runs
    * over the DAILY AGGREGATE — cardinality = calendar days, the
    * bounded-window exception documented at [[qWindowLagDelta]], not a
    * data-scaled window. */
  val qGapFill: Q = Q("q_gap_fill",
    """WITH daily AS (
      |  SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS day,
      |         COUNT(*)::BIGINT AS n,
      |         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |           AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1, 2),
      |bounds AS (SELECT k, MIN(day) AS lo, MAX(day) AS hi
      |           FROM daily GROUP BY 1),
      |cal AS (SELECT k, CAST(unnest(generate_series(lo::TIMESTAMP,
      |               hi::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day
      |        FROM bounds),
      |filled AS (
      |  SELECT c.k, c.day, COALESCE(d.n, 0) AS n, d.rev_cents
      |  FROM cal c LEFT JOIN daily d ON d.k = c.k AND d.day = c.day)
      |SELECT k, day, n,
      |  CAST(last_value(rev_cents IGNORE NULLS) OVER (
      |    PARTITION BY k ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS rev_cents_ffill
      |FROM filled ORDER BY k, day""".stripMargin) { (s, d) =>
    val daily = Tables.load(s, d, "orders")
      .groupBy(col("o_orderpriority").as("k"),
        to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .cast("long").as("rev_cents"))
    val cal = daily.groupBy("k")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("k"), explode_outer(
        sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      .filter(col("day").isNotNull)
    val w = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"), col("rev_cents"))
      .withColumn("rev_cents_ffill",
        last("rev_cents", ignoreNulls = true).over(w))
      .select("k", "day", "n", "rev_cents_ffill")
      .orderBy("k", "day")
  }

  /** Record linkage (entity resolution) in the standard two-phase shape:
    * BLOCK on a cheap key — here (brand, last name token) — so candidate
    * pairs are per-block quadratic instead of corpus-quadratic, then
    * VERIFY candidates with character-level edit distance (levenshtein —
    * identical DP algorithm in both engines, integer-exact). Output is
    * the per-block match census. At a real corpus the blocking key must
    * scale its cardinality with the data (phonetic codes, name
    * fingerprints, the SymSpell delete-neighborhood) — the block-join
    * + verify SHAPE is what this operator pins. */
  val qRecordLinkage: Q = Q("q_record_linkage",
    """WITH p AS (SELECT p_partkey, p_brand, p_name,
      |             string_split(p_name, ' ')[-1] AS blk FROM part),
      |pairs AS (
      |  SELECT a.p_brand, a.blk,
      |         levenshtein(a.p_name, b.p_name) AS lev
      |  FROM p a JOIN p b
      |    ON a.p_brand = b.p_brand AND a.blk = b.blk
      |   AND a.p_partkey < b.p_partkey)
      |SELECT p_brand, blk, COUNT(*) AS n_pairs,
      |       CAST(SUM(CASE WHEN lev = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_exact,
      |       CAST(SUM(CASE WHEN lev BETWEEN 1 AND 3 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_fuzzy
      |FROM pairs GROUP BY 1, 2 ORDER BY p_brand, blk""".stripMargin) {
    (s, d) =>
      // same plan object both sides + shuffle_hash: one reused exchange
      val p = Tables.load(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"),
          element_at(split(col("p_name"), " "), -1).as("blk"))
      val lev = levenshtein(col("a.p_name"), col("b.p_name"))
      p.as("a").hint("shuffle_hash").join(p.as("b").hint("shuffle_hash"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.blk") === col("b.blk") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_brand").as("p_brand"), col("a.blk").as("blk"),
          lev.as("lev"))
        .groupBy("p_brand", "blk")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("lev") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("lev").between(1, 3), 1L).otherwise(0L))
            .as("n_fuzzy"))
        .orderBy("p_brand", "blk")
  }

  /** Funnel window: each step must follow the previous within 24h. */
  private val FunnelWindowUs = 24L * 3600L * 1000000L

  /** Ordered conversion funnel (view → click → purchase, each step within
    * 24h of the previous): the product-analytics staple. Each stage is a
    * per-user min-timestamp aggregate equi-joined to the previous stage —
    * one shuffle on user_id per step, no window over raw events, no
    * cross-stage explosion (stage frames shrink monotonically). */
  val qFunnel: Q = Q("q_funnel",
    s"""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
       |           WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       |      JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
       |       AND epoch_us(e.ts) - epoch_us(v.t1) <= $FunnelWindowUs
       |      WHERE e.event_type = 'click' GROUP BY 1),
       |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       |      JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
       |       AND epoch_us(e.ts) - epoch_us(c.t2) <= $FunnelWindowUs
       |      WHERE e.event_type = 'purchase' GROUP BY 1)
       |SELECT 'step1_view' AS step, COUNT(*)::BIGINT AS n_users FROM v
       |UNION ALL SELECT 'step2_click', COUNT(*)::BIGINT FROM c
       |UNION ALL SELECT 'step3_purchase', COUNT(*)::BIGINT FROM p
       |ORDER BY step""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
    def firstAfter(evType: String, prev: DataFrame,
        prevTs: String, out: String): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev.select(col("user_id").as("uid"), col(prevTs)),
          col("user_id") === col("uid") && col("ts") > col(prevTs) &&
            unix_micros(col("ts")) - unix_micros(col(prevTs))
              <= FunnelWindowUs)
        .groupBy("user_id").agg(min("ts").as(out))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = firstAfter("click", v, "t1", "t2")
    val p = firstAfter("purchase", c, "t2", "t3")
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("step"), col("n_users"))
    stage("step1_view", v)
      .unionAll(stage("step2_click", c))
      .unionAll(stage("step3_purchase", p))
      .orderBy("step")
  }

  /** Weekly retention cohorts (purchase retention): users grouped by
    * first-seen week; for each (cohort week, week offset) the count of
    * cohort members who purchased that week. Two shuffles on user_id
    * (first-seen aggregate + join) and one on the bounded (cohort,
    * offset) key — the cohort matrix is weeks², never data-scaled. */
  val qRetentionCohorts: Q = Q("q_retention_cohorts",
    """WITH first AS (SELECT user_id,
      |                 CAST(date_trunc('week', MIN(ts)) AS DATE)
      |                 AS cohort_week FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT e.user_id, f.cohort_week,
      |          CAST(date_diff('day', f.cohort_week,
      |            CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
      |            AS week_offset
      |        FROM events e JOIN first f ON f.user_id = e.user_id
      |        WHERE e.event_type = 'purchase')
      |SELECT cohort_week, week_offset, COUNT(*)::BIGINT AS n_users
      |FROM act GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
    ev.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          col("cohort_week")).cast("long") / 7).cast("long")
          .as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val all: Seq[Q] = Seq(
    qSemiJoin, qAntiJoin, qOuterJoinAgg, qUnionAllNames,
    qSetIntersectExcept, qWindowRank, qWindowRunning, qWindowLagDelta,
    qRollup, qCube, qDistinctAgg, qBitmapDistinct, qTopkOrders,
    qJsonExtract, qSessionize,
    qSessionWindow, qTumblingHour, qSlidingQuarter, qAsofPriorClick,
    qAsofTolerance,
    qPivotConditional, qTopkPerKeyCustom, qRangeJoinBands, qGapFill,
    qRecordLinkage, qFunnel, qRetentionCohorts)
}
