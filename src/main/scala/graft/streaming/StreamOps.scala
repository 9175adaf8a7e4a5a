package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9: absent in the reference;
  * the `events` stream is the extension surface). Each transform takes a
  * DataFrame so it runs identically on `spark.read` (batch backfill) and
  * `spark.readStream` (live) — the batch twins in
  * [[graft.queries.RelOps]] (q_tumbling_hour, q_sessionize) are the
  * oracle-checked semantics for these operators.
  */
object StreamOps {

  /** Hourly tumbling-window counts with a 2h watermark: late events beyond
    * the watermark are dropped, state is bounded (window + watermark is
    * the scale-safe streaming aggregate — no unbounded keys). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Sliding-window counts (window `size` advancing every `slide`): each
    * event lands in size/slide overlapping windows — the hopping-window
    * aggregate for rate dashboards. Same bounded-state posture as
    * [[hourlyCounts]]: the watermark closes windows, state per key is
    * #open-windows × #event-types, independent of stream length. */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"))

  /** Streaming count-min: hourly token-frequency sketches via the SAME
    * mergeable [[graft.functions.CountMinAgg]] aggregator as the batch
    * query — per open window the state store holds one D×W counter
    * array, not the token rows, and the watermark closes windows. The
    * streaming/batch symmetry is the point: a sketch computed on the
    * stream equals the sketch of the same rows at rest (spec-asserted),
    * so dashboards and backfills agree exactly. Input: (ts, h) with `h`
    * an element hash ([[graft.functions.TextHash.hash32]]). */
  def hourlySketch(hashes: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    hashes
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.CountMinAgg.sketch(col("h")).as("sk"))
      .select(col("window.start").as("hour_start"), col("sk"))

  /** Stream-static enrichment: the streaming fact joined to a static
    * dimension frame. No state store is involved (unlike stream-stream
    * joins) — Spark re-plans the static side per micro-batch, broadcast
    * here since dimensions are small; at scale this is the standard
    * pattern for decorating an event stream with slowly-changing
    * reference data. */
  def enrich(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup: drop replayed event ids, with state bounded
    * by the watermark (an at-least-once source made exactly-once). The
    * batch twin is a plain dropDuplicates. */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream interval join: each purchase attributed to the same
    * user's clicks within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state store
    * holds at most watermark+interval of either side — the bounded-state
    * shape stream-stream joins require at scale (unbounded conditions
    * would accumulate state forever). Runs identically on a batch frame
    * (plain range join). */
  def attributePurchases(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select("user_id", "purchase_id", "purchase_ts", "click_id",
        "click_ts")
  }

  /** foreachBatch sink into the date-partitioned layout, EXACTLY-ONCE
    * under micro-batch replay: rows land as parquet under
    * `path/__day=.../__batch=N/`, written with dynamic partition overwrite
    * — an overwrite replaces only the `(__day, __batch)` partitions
    * present in the incoming batch. foreachBatch batch ids are stable
    * across retries, so a replayed batch rewrites exactly its own
    * previous output and never duplicates (the reference's whole pipeline
    * is idempotent by rebuild, src/job.py:296-299; this is the streaming
    * equivalent). Same day-partitioned posture as
    * [[graft.scale.Scale.writePartitionedByDay]] — downstream batch
    * queries still prune on the leading `__day` key; `__batch` is an
    * idempotency detail they ignore. */
  def sinkPartitionedByDay(stream: DataFrame, tsCol: String,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      writeBatchPartitionedByDay(batch, batchId, tsCol, path)
    }

  /** The per-batch writer behind [[sinkPartitionedByDay]], factored out so
    * replay idempotence is testable directly: calling it twice with the
    * same `batchId` leaves one copy of the rows. */
  private[graft] def writeBatchPartitionedByDay(batch: DataFrame,
      batchId: Long, tsCol: String, path: String): Unit =
    batch.withColumn("__day", to_date(col(tsCol)))
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__day", "__batch")
      .parquet(path)

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)

  final case class SessionState(
      start: Timestamp, last: Timestamp, n: Int)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState: per-user state
    * holds the open session; a gap > `gapMinutes` closes it.
    *
    * Streaming mode is driven by EVENT-TIME TIMEOUTS: the open session's
    * timeout is set to `last + gap`, a watermark (`watermarkDelay`) is
    * applied to the input, and when the watermark passes the timeout the
    * group fires with an empty iterator and the session is emitted — no
    * new event for that user is needed. State per user is one open
    * session, removed on timeout: bounded by active users, the scale-safe
    * shape.
    *
    * In batch mode Spark feeds each group once with no prior state and no
    * timeouts; the trailing session flushes at end-of-group — same
    * semantics as the windowed SQL twin (q_sessionize), which the spec
    * asserts.
    *
    * Out-of-order events (admitted whenever `watermarkDelay` > 0; they
    * reach the open session only across micro-batches, since each batch is
    * sorted): an event within gap-distance of the session interval merges
    * and EXTENDS the interval (`start = min`, `last = max` — never
    * regresses either end); an event more than a gap before the session's
    * start can never merge and is emitted as its own singleton session. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val streaming = events.isStreaming // don't capture the Dataset itself

    // full-precision epoch micros: Timestamp.getTime alone truncates to ms
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    val input = if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close it
            val outs = state.getOption.toList.flatten
              .map(s => SessionOut(user, s.start, s.last, s.n))
            state.remove()
            outs.iterator
          } else {
            // sort the group's batch; carry any open session from state
            val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
            var open: Option[SessionState] =
              state.getOption.flatMap(_.headOption)
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              open = open match {
                case Some(s) if us(e.ts) >= us(s.start) - gapUs &&
                    us(e.ts) - us(s.last) <= gapUs =>
                  // within gap-distance of the session interval. An
                  // ADMITTED out-of-order event (possible across batches
                  // whenever watermarkDelay > 0) may land inside or before
                  // the open session — extend both ends, never regress
                  Some(SessionState(
                    if (us(e.ts) < us(s.start)) e.ts else s.start,
                    if (us(e.ts) > us(s.last)) e.ts else s.last,
                    s.n + 1))
                case Some(s) if us(e.ts) > us(s.last) =>
                  closed += SessionOut(user, s.start, s.last, s.n)
                  Some(SessionState(e.ts, e.ts, 1))
                case Some(s) =>
                  // late event more than a gap BEFORE the open session: it
                  // can never merge (its neighbourhood already emitted) —
                  // close it alone, keep the open session untouched
                  closed += SessionOut(user, e.ts, e.ts, 1)
                  Some(s)
                case None => Some(SessionState(e.ts, e.ts, 1))
              }
            }
            open.foreach { s =>
              if (!streaming) closed += SessionOut(user, s.start, s.last, s.n)
              else {
                state.update(List(s))
                // fire when the event-time watermark passes last + gap
                state.setTimeoutTimestamp(
                  Math.floorDiv(us(s.last), 1000L) + gapMinutes * 60L * 1000L)
              }
            }
            closed.result().iterator
          }
      }
  }
}
