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

  /** Streaming exact dedup: drop replayed event ids, with state bounded
    * by the watermark (an at-least-once source made exactly-once). The
    * batch twin is a plain dropDuplicates. */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)

  final case class SessionState(
      start: Timestamp, last: Timestamp, n: Int)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState: per-user state
    * holds the open session; a gap > `gapMinutes` (or state timeout in
    * streaming mode) closes it. In batch mode Spark feeds each group once
    * with no prior state — same semantics as the windowed SQL twin
    * (q_sessionize), which the spec asserts. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val streaming = events.isStreaming // don't capture the Dataset itself

    // full-precision epoch micros: Timestamp.getTime alone truncates to ms
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // sort the group's batch; carry any open session from state
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var open: Option[SessionState] =
            state.getOption.flatMap(_.headOption)
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            open = open match {
              case Some(s) if us(e.ts) - us(s.last) <= gapUs =>
                Some(s.copy(last = e.ts, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(user, s.start, s.last, s.n)
                Some(SessionState(e.ts, e.ts, 1))
              case None => Some(SessionState(e.ts, e.ts, 1))
            }
          }
          // batch mode: groups arrive once, flush the trailing session;
          // a streaming deployment would keep it in state + use timeouts
          open.foreach { s =>
            if (state.hasTimedOut || !streaming)
              closed += SessionOut(user, s.start, s.last, s.n)
            else state.update(List(s))
          }
          closed.result().iterator
      }
  }
}
