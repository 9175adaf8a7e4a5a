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

  val all: Seq[Q] = Seq(qIntervalMerge, qMarkovTransitions)
}
