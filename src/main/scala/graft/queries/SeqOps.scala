package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Temporal-sequence analytics: interval coalescing and first-order
  * transition (Markov) statistics — the order-sensitive operators a
  * warehouse owes its event data, each windowed on a HIGH-cardinality
  * entity key so parallelism scales with entities, never with a value
  * domain (the q_pack_chunks lesson, applied at design time).
  *
  * Determinism: all day arithmetic is integer epoch-day keys
  * (`epoch_us // 86400e6` — both engines floor the same integers; no
  * date+interval type divergence), orderings carry a unique tiebreak
  * column, and probabilities are single divisions of two longs.
  */
object SeqOps {

  /** Interval coalescing (merge overlapping validity windows): each
    * order opens a 30-day activity interval; per customer, overlapping
    * or touching intervals merge into spans. The classic warehouse
    * "collapse ranges" operator, spelled as one window pass:
    * a running MAX of interval ends (strict predecessors) decides
    * whether a row starts a new span, and the running SUM of those
    * flags numbers the spans — no self-join, no recursion. Both windows
    * partition on o_custkey (data-scaled key); per-partition group size
    * is a customer's order history, bounded by entity activity, not by
    * the corpus. */
  val qIntervalMerge: Q = Q("q_interval_merge",
    """WITH iv AS (SELECT o_custkey AS custkey, o_orderkey,
      |              epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS start_dk,
      |              epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 + 30 AS end_dk
      |            FROM orders),
      |flagged AS (SELECT custkey, o_orderkey, start_dk, end_dk,
      |              CASE WHEN MAX(end_dk) OVER (
      |                     PARTITION BY custkey ORDER BY start_dk, o_orderkey
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |                   IS NULL THEN 1
      |                   WHEN start_dk > MAX(end_dk) OVER (
      |                     PARTITION BY custkey ORDER BY start_dk, o_orderkey
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |                   THEN 1 ELSE 0 END AS new_span
      |            FROM iv),
      |spans AS (SELECT custkey, start_dk, end_dk,
      |            CAST(SUM(new_span) OVER (
      |              PARTITION BY custkey ORDER BY start_dk, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS span_id
      |          FROM flagged)
      |SELECT custkey, span_id,
      |       CAST(MIN(start_dk) AS BIGINT) AS span_start_dk,
      |       CAST(MAX(end_dk) AS BIGINT) AS span_end_dk,
      |       COUNT(*) AS n_orders
      |FROM spans GROUP BY 1, 2
      |ORDER BY custkey, span_id""".stripMargin) { (s, d) =>
    // NTZ → TIMESTAMP is the identity instant in the UTC session; both
    // engines then floor the same epoch-microsecond integers
    val dk = expr(
      "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    val w = Window.partitionBy("custkey").orderBy("start_dk", "o_orderkey")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, d, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        dk.as("start_dk"), (dk + 30).as("end_dk"))
      .withColumn("prev_max", max("end_dk").over(wPrev))
      .withColumn("new_span",
        when(col("prev_max").isNull || col("start_dk") > col("prev_max"), 1)
          .otherwise(0))
      .withColumn("span_id", sum("new_span").over(wRun).cast("long"))
      .groupBy("custkey", "span_id")
      .agg(min("start_dk").cast("long").as("span_start_dk"),
        max("end_dk").cast("long").as("span_end_dk"),
        count(lit(1)).as("n_orders"))
      .orderBy("custkey", "span_id")
  }

  /** First-order transition matrix over the event stream (Markov-chain
    * statistics / session path analysis): for each user, consecutive
    * event pairs in (ts, event_id) order; globally, transition counts
    * and row-normalized probabilities. The lead() window partitions on
    * user_id — data-scaled; the transition aggregate then shrinks to
    * |event types|² rows, so the output (and the probability join) is
    * bounded by the type domain. p is one division of two longs. */
  val qMarkovTransitions: Q = Q("q_markov_transitions",
    """WITH seq AS (SELECT user_id, event_type,
      |               lead(event_type) OVER (
      |                 PARTITION BY user_id ORDER BY ts, event_id)
      |                 AS next_type
      |             FROM events),
      |t AS (SELECT event_type AS from_type, next_type AS to_type,
      |        COUNT(*) AS n
      |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      |        FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n,
      |       CAST(t.n AS DOUBLE) / tot.n_from AS p
      |FROM t JOIN tot ON tot.from_type = t.from_type
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val t = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("from_type").as("ft"))
      .agg(sum("n").cast("long").as("n_from"))
    t.join(broadcast(tot), col("from_type") === col("ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from")).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Top navigation paths: the 20 most frequent ordered event-type
    * TRIGRAMS across all user timelines ([[qMarkovTransitions]] is the
    * first-order view; three-step paths expose the flows a transition
    * matrix marginalizes away — view→click→purchase vs view→click→view
    * have identical bigram mass).
    *
    * One window pass per user (lead ×2 over the same user_id window —
    * Spark plans both leads in a single WindowExec), then a
    * type-domain³-bounded aggregate with map-side partial counts and a
    * heap top-20 (TakeOrderedAndProject). The window partitions on the
    * data-scaled entity key, so parallelism grows with users; no
    * operator's state exceeds the type-domain cube. */
  val qPathTrigrams: Q = Q("q_path_trigrams",
    """WITH s AS (SELECT event_type AS e1,
      |             lead(event_type, 1) OVER (
      |               PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |             lead(event_type, 2) OVER (
      |               PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |           FROM events)
      |SELECT e1, e2, e3, COUNT(*) AS n
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("e1"), asc("e2"), asc("e3"))
      .limit(20)
  }

  /** Step deadline for [[qFunnelSteps]]: 3 days in epoch micros — sized
    * to the corpus's per-user event cadence so each stage genuinely
    * discriminates (150 → 115 → 81 users at sf0.01). */
  val FunnelWindowUs: Long = 3L * 86400000000L

  /** Ordered conversion FUNNEL with per-step deadlines — the
    * event-analytics staple: first `view` per user, first `click`
    * within 3 days AFTER that view, first `purchase` within 3 days
    * after that click; per-step user counts and the end-to-end
    * conversion rate.
    *
    * Order sensitivity is the point: a `click` BEFORE the first view
    * does not advance the funnel, so the steps cannot collapse into
    * one conditional aggregate — each stage is MIN-after-a-threshold,
    * where the threshold is the previous stage's result. The spelling
    * is a cascade of keyed aggregates + keyed joins on user_id: stage k
    * filters its event type, joins the stage-(k−1) frame (shuffle on
    * the data-scaled user key), and takes MIN(t) past the threshold.
    * The candidate set shrinks monotonically stage over stage, and no
    * window function ever orders a user's full history — at 100 TB
    * each stage is one keyed shuffle of one event type's rows.
    * Deadlines, thresholds and instants are integer epoch-micros; the
    * conversion rate is a single division. */
  val qFunnelSteps: Q = Q("q_funnel_steps",
    s"""WITH e AS (SELECT user_id, event_type,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
       |s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
       |       WHERE event_type = 'view' GROUP BY 1),
       |s2 AS (SELECT e.user_id, MIN(e.t) AS t2 FROM e
       |       JOIN s1 ON s1.user_id = e.user_id
       |       WHERE e.event_type = 'click' AND e.t >= s1.t1
       |         AND e.t < s1.t1 + $FunnelWindowUs GROUP BY 1),
       |s3 AS (SELECT e.user_id, MIN(e.t) AS t3 FROM e
       |       JOIN s2 ON s2.user_id = e.user_id
       |       WHERE e.event_type = 'purchase' AND e.t >= s2.t2
       |         AND e.t < s2.t2 + $FunnelWindowUs GROUP BY 1),
       |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       |      FROM e)
       |SELECT n.n_users,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS viewed,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
       |    AS clicked_after_view,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
       |    AS purchased_after_click,
       |  CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
       |    / (SELECT COUNT(*) FROM s1) AS view_to_purchase
       |FROM n""".stripMargin) { (s, d) =>
    val e = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("t") >= col("t1") &&
        col("t") < col("t1") + FunnelWindowUs)
      .groupBy("user_id").agg(min("t").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("t") >= col("t2") &&
        col("t") < col("t2") + FunnelWindowUs)
      .groupBy("user_id").agg(min("t").as("t3"))
    val n = e.agg(count_distinct(col("user_id")).cast("long").as("n_users"))
    val c1 = s1.agg(count(lit(1)).as("viewed"))
    val c2 = s2.agg(count(lit(1)).as("clicked_after_view"))
    val c3 = s3.agg(count(lit(1)).as("purchased_after_click"))
    n.crossJoin(broadcast(c1)).crossJoin(broadcast(c2))
      .crossJoin(broadcast(c3))
      .select(col("n_users"), col("viewed"), col("clicked_after_view"),
        col("purchased_after_click"),
        (col("purchased_after_click").cast("double") / col("viewed"))
          .as("view_to_purchase"))
  }

  /** Time-to-convert distribution: per user, the lag from FIRST view to
    * the first purchase at-or-after it; reported as the exact median and
    * p90 lag at ranks ⌈p·N/100⌉ — the funnel family's "how long", where
    * [[qFunnelSteps]] answers "how many".
    *
    * Per-user endpoints are two keyed MIN aggregates chained by ONE
    * equi-join on user_id (no window ever orders a user's raw history);
    * the lag quantiles ride
    * [[graft.text.TextOps.globalRankByRange]] — range slices, local
    * ranks, broadcast offsets; no global sort. All epoch-micro integer
    * arithmetic; rank targets use the (n·p+99) div 100 ceiling spelling
    * exact in both engines. */
  val qConversionLag: Q = Q("q_conversion_lag",
    """WITH ev AS (SELECT user_id, event_type,
      |              epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
      |fv AS (SELECT user_id, MIN(t) AS view_t FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |bu AS (SELECT ev.user_id, fv.view_t, MIN(ev.t) AS buy_t
      |       FROM ev JOIN fv ON fv.user_id = ev.user_id
      |       WHERE ev.event_type = 'purchase' AND ev.t >= fv.view_t
      |       GROUP BY 1, 2),
      |lag AS (SELECT user_id, buy_t - view_t AS lag_us FROM bu),
      |r AS (SELECT lag_us,
      |        CAST(ROW_NUMBER() OVER (ORDER BY lag_us, user_id)
      |          AS BIGINT) AS rnk,
      |        CAST(COUNT(*) OVER () AS BIGINT) AS n
      |      FROM lag),
      |t AS (SELECT CAST(q AS BIGINT) AS pct, nn.n AS n_conv,
      |        CAST(GREATEST(1, (nn.n * q + 99) // 100) AS BIGINT)
      |          AS rank
      |      FROM (SELECT DISTINCT n FROM r) nn
      |      CROSS JOIN (VALUES (50), (90)) AS qs(q))
      |SELECT t.pct, t.n_conv, t.rank, r.lag_us
      |FROM t JOIN r ON r.rnk = t.rank ORDER BY t.pct""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("view_t"))
      // materialized once (converting-user-sized): both consumers below
      // — the rank subtree and the n_conv count — would otherwise each
      // re-run the whole endpoint pipeline (their exchanges do not
      // canonicalize together, so ReuseExchange cannot fold them)
      val lag = ev.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("t") >= col("view_t"))
        .groupBy("user_id", "view_t").agg(min("t").as("buy_t"))
        .select(col("user_id"), (col("buy_t") - col("view_t")).as("lag_us"))
        .localCheckpoint(true)
      val ranked = graft.text.TextOps.globalRankByRange(lag,
        Seq(col("lag_us").asc, col("user_id").asc))
      val targets = Seq(50L, 90L).toDF("pct")
        .crossJoin(broadcast(lag.agg(count(lit(1)).as("n_conv"))))
        .select(col("pct"), col("n_conv"),
          greatest(lit(1L), expr("(n_conv * pct + 99) div 100"))
            .as("rank"))
      ranked.join(broadcast(targets), col("rnk") === col("rank"))
        .select(col("pct"), col("n_conv"), col("rank"), col("lag_us"))
        .orderBy("pct")
  }

  val all: Seq[Q] = Seq(qIntervalMerge, qMarkovTransitions, qPathTrigrams,
    qFunnelSteps, qConversionLag)
}
