package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Streaming hourly DISTINCT-count registers: the same HyperLogLog
    * bucket/rank decomposition as the batch `q_hll_distinct` inside a
    * watermarked window aggregate. Per open window the state store holds
    * 64 register rows (max rank per bucket) — distinct users per hour
    * with O(registers) state instead of O(users), and since max is
    * idempotent and mergeable, a register row computed on the stream
    * equals the one computed over the same rows at rest (spec-asserted,
    * same symmetry as [[hourlySketch]]). Input: (ts, user_id). */
  def hourlyDistinctSketch(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      // composed-builtins hash form: value-identical to the native
      // expression but needs no session registration (streaming jobs may
      // never call Tables.load)
      .withColumn("hv",
        graft.functions.TextHash.hash32Composed(col("user_id").cast("string")))
      .select(col("ts"), (col("hv") % 64).as("bucket"),
        expr("CASE WHEN hv div 64 = 0 THEN 26 " +
          "ELSE 26 - length(bin(hv div 64)) END").cast("int").as("r"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max("r").as("mr"))
      .select(col("window.start").as("hour_start"), col("bucket"), col("mr"))

  /** Streaming hourly EXACT distinct users: the
    * [[graft.functions.BitmapDistinctAgg]] OR-merge bitmap inside a
    * watermarked window aggregate — per open window the state store
    * holds ONE fixed-size word array (⌈domain/64⌉ longs), not a
    * per-user row, and the answer is EXACT, the precise complement of
    * [[hourlyDistinctSketch]]'s HLL registers (choose by domain: dense
    * bounded ids → bitmap, unbounded/sparse → sketch). OR is
    * commutative, associative and idempotent, so the streamed result is
    * bit-equal to the batch aggregate over the same rows (spec-gated;
    * idempotence additionally makes replayed events harmless). Input:
    * (ts, user_id) with ids in [0, domain). */
  def hourlyBitmapDistinct(events: DataFrame, domain: Int = 1 << 20,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.BitmapDistinctAgg
        .distinctCount(col("user_id"), domain).as("n_distinct"))
      .select(col("window.start").as("hour_start"), col("n_distinct"))

  /** Streaming hourly HEAVY-HITTER summaries: the
    * [[graft.functions.MisraGriesAgg]] frequent-items sketch inside a
    * watermarked window aggregate — per open window the state store
    * holds ONE ≤ k-pair summary, not per-token counts (O(k) state for
    * an unbounded token domain; the streaming face of
    * q_heavy_hitters' pass 1). The summary is mergeable, so Spark's
    * partial aggregation composes it across micro-batches and
    * partitions the same way the batch aggregate composes it across
    * tasks. NOTE the asymmetry with [[hourlyDistinctSketch]]: MG
    * summaries are merge-ORDER-dependent in their residual values
    * (membership guarantees hold regardless), so the spec asserts the
    * GUARANTEE (every > N/(k+1) token of the window is in the streamed
    * summary) rather than bit-equal state. Input: (ts, tok). */
  def hourlyHeavyHitters(toks: DataFrame, k: Int = 16,
      watermark: String = "2 hours"): DataFrame =
    toks.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.MisraGriesAgg.summary(col("tok"), k).as("mg"),
        count(lit(1)).as("n_total"))
      .select(col("window.start").as("hour_start"), col("mg"),
        col("n_total"))

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

  /** Streaming near-dup ADMISSION CONTROL: incoming documents checked
    * against an indexed static corpus — the streaming face of the
    * MinHash-LSH dedup family. The corpus is banded once
    * ([[graft.dedup.Dedup.lshBands]]); each arriving doc computes its
    * own band keys with pure projections (streaming-safe), stream-static
    * equi-joins on (band, key) — candidates only, never a corpus scan —
    * and candidates are verified with exact shingle Jaccard against the
    * corpus shingle sets. Emits one alert row per (incoming doc,
    * matched corpus doc) at or above `threshold`, deduplicated across
    * bands within the watermark.
    *
    * At scale the static side is the posting-list-shaped LSH index
    * (vocabulary of band keys → docs), re-broadcast or shuffled once per
    * micro-batch by Spark's stream-static machinery; per-batch cost is
    * proportional to the batch's candidates, not to the corpus.
    *
    * `stream` needs (doc_id, ts, text); `corpus` needs (doc_id, text).
    */
  def nearDupAlerts(stream: DataFrame, corpus: DataFrame,
      threshold: Double = 0.8, watermark: String = "1 hour"): DataFrame = {
    import graft.dedup.Dedup
    import graft.functions.TextHash
    // shingle hashing calls the native graft_md5_mod31 — install it for
    // callers whose frames never went through Tables.load
    graft.io.Tables.ensureSessionRegistered(stream.sparkSession)
    val corpusSh = TextHash.addShingleHashes(corpus, col("text"))
      .select(col("doc_id"), col("hs"))
    val corpusIndex = Dedup.lshBands(corpusSh)
      .select(col("band"), col("key"), col("doc_id").as("corpus_doc"))
    val corpusHs = corpusSh
      .select(col("doc_id").as("corpus_doc"), col("hs").as("corpus_hs"))
    val inBands = Dedup.lshBands(
        TextHash.addShingleHashes(stream.withWatermark("ts", watermark),
          col("text")))
      .select(col("doc_id").as("in_doc"), col("ts"), col("hs").as("in_hs"),
        col("band"), col("key"))
    val inter = size(array_intersect(col("in_hs"), col("corpus_hs")))
      .cast("long")
    val un = size(col("in_hs")).cast("long") +
      size(col("corpus_hs")).cast("long") - col("inter")
    inBands
      .join(corpusIndex, Seq("band", "key"))
      .join(corpusHs, Seq("corpus_doc"))
      .withColumn("inter", inter)
      .withColumn("un", un)
      .withColumn("jaccard", col("inter").cast("double") / col("un"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicatesWithinWatermark("in_doc", "corpus_doc")
      .select(col("in_doc"), col("ts"), col("corpus_doc").as("dup_of"),
        col("jaccard"))
  }

  /** Stream-stream interval join: each purchase attributed to the same
    * user's clicks within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state store
    * holds at most watermark+interval of either side — the bounded-state
    * shape stream-stream joins require at scale (unbounded conditions
    * would accumulate state forever). Runs identically on a batch frame
    * (plain range join).
    *
    * `joinType = "leftOuter"` keeps unattributed purchases: in streaming
    * mode the null-click row emits once the watermark proves no matching
    * click can still arrive (purchase state expiry) — exactly the
    * "campaign spend with no attributable click" report, emitted
    * as-late-as-necessary but no later. */
  def attributePurchases(events: DataFrame,
      watermarkDelay: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
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
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
        joinType)
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

  /** Streaming MERGE apply — the streaming twin of
    * [[graft.queries.CdcOps.qMergeUpsert]]: each micro-batch's per-key
    * delta (event count, value cents) is merged into a keyed state table
    * by one full-outer join, and the state is EXACTLY-ONCE under batch
    * replay because versions form a deterministic chain: batch N reads
    * the newest state version `v < N` and overwrites `v=N` wholesale, so
    * a replayed batch re-reads the same predecessor and rewrites exactly
    * its own output (same idempotency-by-construction posture as
    * [[sinkPartitionedByDay]], and the incremental generalisation of the
    * reference's rebuild, reference src/job.py:296-299).
    *
    * The per-batch cost is one keyed shuffle join plus a state rewrite;
    * at 100 TB the refinement is hash-bucketed state with per-bucket
    * overwrite (only buckets containing delta keys rewrite) — the chain
    * argument is unchanged, the rewrite bound drops from O(state) to
    * O(touched buckets). That refinement is implemented:
    * [[mergeUpsertSinkBucketed]] / [[readBucketedState]].
    *
    * `checkpointLocation` is REQUIRED (ADVICE r4 #2): the exactly-once
    * chain depends on batch ids being monotone across restarts, which
    * only a durable checkpoint guarantees. A restart with a fresh/temp
    * checkpoint resets batchId to 0, so "newest v < 0" finds nothing and
    * the v=0 write silently discards all accumulated state. Failing fast
    * here turns that silent data loss into a constructor error. Versions
    * older than the newest three are pruned after each successful write
    * (three, not one: a checkpoint-replayed batch N re-reads newest
    * v < N, so its predecessor must survive batch N's own prune). */
  def mergeUpsertSink(stream: DataFrame, statePath: String,
      checkpointLocation: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    require(checkpointLocation.trim.nonEmpty,
      "mergeUpsertSink requires a durable checkpointLocation: without one " +
        "a restart resets batchId to 0 and discards all accumulated state")
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMergeBatch(batch, batchId, statePath)
      }
  }

  /** The per-batch merge behind [[mergeUpsertSink]], factored out so
    * replay idempotence is testable directly. Input batch: (user_id,
    * value); state row: (user_id, n, cents). */
  private[graft] def applyMergeBatch(batch: DataFrame, batchId: Long,
      statePath: String): Unit =
    mergeDeltaInto(deltaOf(batch), batchId, statePath)

  /** Per-key delta of one micro-batch: (user_id, dn, dc). */
  private def deltaOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("dn"),
        sum(round(col("value") * 100, 0).cast("long")).as("dc"))

  /** Versions under `root` whose write COMMITTED (the `_SUCCESS` marker
    * the parquet job commit protocol writes last). A crash mid-write
    * leaves a `v=` directory with some task-committed part files and no
    * marker — a TORN version that must be invisible to every reader:
    * the state read surface would serve partial sums, and (defensively)
    * a merge must never chain off one. The chaos spec in StreamOpsSpec
    * pins this by planting exactly such a directory. */
  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(
        new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(2).toLong)

  /** One version-chain merge step under `statePath`: read the newest
    * state version < batchId, full-outer-merge the delta, overwrite
    * v=batchId, prune to the newest 3 versions. */
  private def mergeDeltaInto(delta: DataFrame, batchId: Long,
      statePath: String): Unit = {
    val spark = delta.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(statePath), spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(statePath)
    val prevVersion = committedVersions(fs, root)
      .filter(_ < batchId) // replay must NOT read its own prior output
      .sorted.lastOption
    val prev = prevVersion match {
      case Some(v) => spark.read.parquet(s"$statePath/v=$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "user_id BIGINT, n BIGINT, cents BIGINT"))
    }
    prev.select(col("user_id").as("pk"), col("n"), col("cents"))
      .join(delta, col("pk") === col("user_id"), "full_outer")
      .select(
        coalesce(col("pk"), col("user_id")).as("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .cast("long").as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .cast("long").as("cents"))
      .write.mode("overwrite").parquet(s"$statePath/v=$batchId")
    // prune: keep the newest 3 versions ≤ batchId (replay of batch N needs
    // newest v < N alive); growth was one full state copy per micro-batch
    val keep = fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .sorted.reverse
    keep.drop(3).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v=$v"), true)
    }
  }

  /** Hash-bucketed state — the 100 TB refinement promised in
    * [[mergeUpsertSink]]'s scaladoc, now real: state lives in `buckets`
    * hash partitions (`bucket=<b>/v=<n>`), each with its OWN version
    * chain, and a micro-batch rewrites ONLY the buckets its delta keys
    * hash into. The per-bucket replay argument is [[applyMergeBatch]]'s
    * unchanged — a replayed batch re-reads each touched bucket's newest
    * v < batchId and rewrites exactly its own v=batchId — and a bucket
    * the batch does not touch keeps its newest version, which remains
    * the read surface ([[readBucketedState]]). Rewrite cost per batch
    * drops from O(|state|) to O(Σ touched-bucket sizes): with keys
    * hashing uniformly and a micro-batch touching k distinct keys, that
    * is ≤ min(k, buckets)/buckets of the state. */
  private[graft] def applyMergeBatchBucketed(batch: DataFrame,
      batchId: Long, statePath: String, buckets: Int): Unit = {
    val delta = deltaOf(batch)
      .withColumn("__b", pmod(col("user_id"), lit(buckets.toLong)))
      .localCheckpoint(true) // one delta computation, reused per bucket
    val touched = delta.select("__b").distinct().collect()
      .map(_.getLong(0)).sorted // bounded by `buckets`
    touched.foreach { b =>
      mergeDeltaInto(delta.filter(col("__b") === b).drop("__b"),
        batchId, s"$statePath/bucket=$b")
    }
  }

  /** The bucketed sibling of [[mergeUpsertSink]] (same fail-fast
    * checkpoint contract). */
  def mergeUpsertSinkBucketed(stream: DataFrame, statePath: String,
      checkpointLocation: String, buckets: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    require(checkpointLocation.trim.nonEmpty,
      "mergeUpsertSinkBucketed requires a durable checkpointLocation: " +
        "without one a restart resets batchId to 0 and discards all " +
        "accumulated state")
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyMergeBatchBucketed(batch, batchId, statePath, buckets)
      }
  }

  /** Current state of a bucketed merge sink: per bucket, its newest
    * COMMITTED version (buckets never touched by any batch are simply
    * absent). Torn versions — a crash mid-write leaves part files
    * without the `_SUCCESS` job-commit marker — are invisible: the read
    * surface serves the bucket's previous committed version until the
    * replayed batch rewrites the torn one (chaos-spec-pinned). */
  def readBucketedState(spark: SparkSession, statePath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(statePath), spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(statePath)
    val newest =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith("bucket="))
        .flatMap { b =>
          committedVersions(fs, b)
            .sorted.lastOption
            .map(v => s"$b/v=$v")
        }
    if (newest.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, n BIGINT, cents BIGINT"))
    else spark.read.parquet(newest: _*)
  }

  final case class TypedEv(user_id: Long, event_type: String, ts: Timestamp)

  /** [[conversionLag]] state: the user's earliest admitted view (epoch
    * micros; MaxValue = none yet) plus the DISTINCT admitted purchase
    * instants that could still be elected, kept ASCENDING-sorted. A
    * later-admitted EARLIER view (possible while the watermark trails
    * it) can move the answer to a purchase that preceded the old first
    * view — but any future admissible view has ts ≥ watermark, so the
    * final first-view V is ≥ min(viewUs, wm) and purchases below that
    * bound are pruned every invocation (ADVICE r5): the held set is
    * bounded by the user's distinct purchase instants INSIDE the
    * watermark horizon, not all history. `done` marks a sealed
    * tombstone (viewUs/buys cleared): the pair for this user has been
    * emitted and later episodes are suppressed until the gc horizon. */
  final case class ConvState(
      viewUs: Long, buys: List[Long], lastUs: Long, done: Boolean)

  final case class ConvOut(
      user_id: Long, view_us: Long, buy_us: Long, lag_us: Long)

  /** Streaming TIME-TO-CONVERT — the stateful twin of the batch
    * q_conversion_lag endpoints: per user, the earliest view V and the
    * earliest purchase B ≥ V, emitted exactly once with its lag.
    *
    * Finality argument (why emission is safe, no retraction needed):
    * the candidate (V, B) is emitted only once the event-time watermark
    * has passed B. Every event still admissible then has ts ≥ wm ≥ B:
    * a new view cannot lower V below B (let alone below V), and a new
    * purchase cannot beat B — so the pair is immutable. While the
    * watermark trails B, an admitted out-of-order earlier view CAN
    * lower V and re-elect an earlier purchase; that is exactly why the
    * state keeps all distinct purchase instants until sealing.
    *
    * Non-converting users are garbage-collected `gcMinutes` of event
    * time after their latest event (no emission) — the operational
    * horizon every attribution system picks; a conversion landing past
    * the horizon is attributed as a fresh state. After the pair seals,
    * the state is NOT removed but kept as a `done` tombstone (user key
    * only, empty buys) until the same gc horizon: a second view→purchase
    * episode arriving post-seal (admissible — ts ≥ wm ≥ buy) would
    * otherwise rebuild fresh state and emit a SECOND pair for the user,
    * while batch mode over the same rows emits only the global first
    * pair (ADVICE r5). With the tombstone, streaming ≡ batch for any
    * episode inside the gc horizon; past it, both the tombstone and the
    * would-have-been batch window are gone and a new episode is a fresh
    * user by declared semantics. In batch mode the same function
    * computes each group's answer directly at end-of-group — the spec
    * asserts batch ≡ streaming over the same admitted rows. */
  def conversionLag(events: Dataset[TypedEv],
      watermarkDelay: String = "0 seconds",
      gcMinutes: Int = 7 * 24 * 60): Dataset[ConvOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming

    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // ascending-sorted distinct insert: span is O(n), but n is the
    // watermark-horizon-pruned purchase set, not all history
    def insBuy(list: List[Long], t: Long): List[Long] = {
      val (lo, hi) = list.span(_ < t)
      if (hi.headOption.contains(t)) list else lo ::: t :: hi
    }

    def fold(st0: ConvState, e: TypedEv): ConvState = {
      val st = st0.copy(lastUs = math.max(st0.lastUs, us(e.ts)))
      e.event_type match {
        case "view" => st.copy(viewUs = math.min(st.viewUs, us(e.ts)))
        case "purchase" => st.copy(buys = insBuy(st.buys, us(e.ts)))
        case _ => st
      }
    }

    def answer(st: ConvState): Option[ConvOut] =
      if (st.viewUs == Long.MaxValue) None
      else st.buys.find(_ >= st.viewUs) // sorted asc: first ≥ V is MIN
        .map(b => ConvOut(-1L, st.viewUs, b, b - st.viewUs))

    val input = if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvState, ConvOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, evs: Iterator[TypedEv], state: GroupState[ConvState]) =>
          val prev = state.getOption
            .getOrElse(ConvState(Long.MaxValue, Nil, Long.MinValue, false))
          val st0 = evs.foldLeft(prev)(fold)
          if (!streaming) answer(st0).map(_.copy(user_id = user)).iterator
          else {
            def armGc(lastUs: Long): Unit =
              // gcMinutes of EVENT time after the user's own latest
              // event (clamped above wm — a deadline at/before the
              // watermark is rejected)
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(lastUs, 1000L) + gcMinutes * 60000L,
                state.getCurrentWatermarkMs() + 1))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            if (prev.done) {
              // sealed tombstone: suppress post-seal episodes (batch
              // emits one pair per user) until the gc horizon
              if (state.hasTimedOut) { state.remove(); Iterator.empty }
              else {
                state.update(ConvState(Long.MaxValue, Nil, st0.lastUs, true))
                armGc(st0.lastUs)
                Iterator.empty
              }
            } else {
              // prune never-electable purchases: any future admissible
              // view has ts ≥ wm, so the final first-view V ≥
              // min(viewUs, wm); purchases below that bound cannot
              // satisfy buy ≥ V (ADVICE r5)
              val st = st0.copy(
                buys = st0.buys.dropWhile(_ < math.min(st0.viewUs, wmUs)))
              val ans = answer(st).map(_.copy(user_id = user))
              ans match {
                case Some(out) if wmUs >= out.buy_us =>
                  // sealed: nothing admissible can change the pair;
                  // leave a tombstone so later episodes are suppressed
                  state.update(
                    ConvState(Long.MaxValue, Nil, st.lastUs, true))
                  armGc(st.lastUs)
                  Iterator.single(out)
                case _ if state.hasTimedOut && ans.isEmpty =>
                  // GC horizon reached with no conversion candidate
                  state.remove()
                  Iterator.empty
                case _ =>
                  state.update(st)
                  // fire when the candidate seals, or — for users with
                  // no candidate yet — at the gc horizon
                  ans match {
                    case Some(out) => state.setTimeoutTimestamp(math.max(
                      Math.floorDiv(out.buy_us, 1000L) + 1L,
                      state.getCurrentWatermarkMs() + 1))
                    case None => armGc(st.lastUs)
                  }
                  Iterator.empty
              }
            }
          }
      }
  }

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)

  final case class SessionState(
      start: Timestamp, last: Timestamp, n: Int)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState: per-user state
    * holds the set of OPEN session intervals; a gap > `gapMinutes`
    * separates sessions.
    *
    * State is a list of disjoint, gap-separated intervals (not just the
    * newest one): an admitted out-of-order event (possible across
    * micro-batches whenever `watermarkDelay` > 0) merges into whichever
    * interval it is within gap-distance of — extending either end, never
    * regressing — and an event that lands within gap-distance of TWO
    * intervals bridges them into one. Late events more than a gap before
    * the newest session therefore open their own interval and still merge
    * with each other (ADVICE r3: the previous emit-immediately-as-
    * singleton shape split mutually-adjacent late events that the batch
    * twin would merge). Interval-hull merging is exactly chain-closure
    * sessionization: each interval's events have consecutive sorted gaps
    * ≤ gap, so any point within gap of the hull is within gap of a member
    * — streaming output equals the batch/SQL-twin sessions over the same
    * admitted rows, regardless of arrival order.
    *
    * An interval is emitted only once the event-time watermark passes its
    * `last + gap` — no still-admissible event can merge with it after
    * that. Emission is driven by EVENT-TIME TIMEOUTS armed at the
    * earliest such deadline; when the watermark passes it the group fires
    * with an empty iterator and every sealed interval flushes. State per
    * user is bounded by #intervals inside the watermark horizon
    * (≤ watermarkDelay/gap + 1): bounded by active users, the scale-safe
    * shape.
    *
    * In batch mode Spark feeds each group once with no prior state and no
    * timeouts; every interval flushes at end-of-group — same semantics as
    * the windowed SQL twin (q_sessionize), which the spec asserts. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val streaming = events.isStreaming // don't capture the Dataset itself

    // full-precision epoch micros: Timestamp.getTime alone truncates to ms
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // merge one event into the disjoint interval list; it may bridge two
    def merge(list: List[SessionState], e: Ev): List[SessionState] = {
      val t = us(e.ts)
      val (near, rest) = list.partition(s =>
        t >= us(s.start) - gapUs && t <= us(s.last) + gapUs)
      val start = (e.ts :: near.map(_.start)).minBy(us)
      val last = (e.ts :: near.map(_.last)).maxBy(us)
      SessionState(start, last, near.map(_.n).sum + 1) :: rest
    }

    val input = if (streaming) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // fold the batch into the carried intervals (chain closure is
          // order-insensitive, so no sort is needed)
          val merged = evs.foldLeft(state.getOption.getOrElse(Nil))(merge)
          if (!streaming) {
            merged.sortBy(s => us(s.start))
              .map(s => SessionOut(user, s.start, s.last, s.n)).iterator
          } else {
            // seal every interval the watermark has passed: future
            // admitted events all have ts >= watermark > last + gap
            val wmMs = state.getCurrentWatermarkMs()
            val (closed, open) =
              merged.partition(s => us(s.last) + gapUs < wmMs * 1000L)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              // fire when the watermark passes the EARLIEST deadline
              // (clamped above the watermark: ms-floor of a µs deadline
              // exactly at the watermark would otherwise be rejected)
              val deadline = open.map(s =>
                Math.floorDiv(us(s.last), 1000L) +
                  gapMinutes * 60L * 1000L).min
              state.setTimeoutTimestamp(math.max(deadline, wmMs + 1))
            }
            closed.sortBy(s => us(s.start))
              .map(s => SessionOut(user, s.start, s.last, s.n)).iterator
          }
      }
  }

  private val memSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Oracle-gated micro-batch run of [[hourlyCounts]] (VERDICT r9 next
    * #6 — the streaming family's CORRECTNESS row): the events table is
    * read through a real `readStream` file source, the SAME windowed
    * aggregate the live pipeline uses runs in complete output mode into
    * a memory sink, and the settled table is the result — so the
    * DuckDB oracle (identical to q_tumbling_hour's batch SQL) gates the
    * micro-batch execution path itself, not a batch twin. Complete
    * mode is what makes the gate exact: no window is left unflushed
    * behind the watermark when the source drains, so stream-at-rest
    * equals batch — the same symmetry the sketch specs assert, now
    * value-checked end-to-end by the driver.
    *
    * Scale posture: identical to [[hourlyCounts]] (watermark-bounded
    * state, map-side-combined counts); the memory sink holds only the
    * hour × event_type aggregate (#hours × #types rows, not events),
    * and the sink's temp view is dropped after the result is
    * materialized so repeated runs don't accumulate session tables.
    * The `ts` normalization is [[graft.io.Tables.normalizeTs]] itself
    * — `Tables.load` can't build a streaming frame (schema must be
    * supplied, not inferred), but the spelling logic is shared. */
  val qStreamHourly: graft.queries.Q = graft.queries.Q("q_stream_hourly",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
      |         AS value_cents
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""
      .stripMargin) { (s, d) =>
    graft.io.Tables.ensureSessionRegistered(s)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the sf layout stores each table as ONE parquet file; the file
    // source monitors a DIRECTORY, so stream the sf dir with a glob
    // filter selecting just the events table
    val ev = graft.io.Tables.normalizeTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
    val name = s"stream_hourly_${memSinkId.incrementAndGet()}"
    val q = hourlyCounts(ev).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val out = s.table(name).orderBy("hour_start", "event_type")
      .localCheckpoint(true)
    s.catalog.dropTempView(name)
    out
  }

  /** Read surface of the flat merge sink: the newest COMMITTED state
    * version under `statePath` (torn versions invisible — same
    * `_SUCCESS`-gated rule the merge itself chains by). */
  def readMergedState(spark: SparkSession, statePath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(statePath), spark.sessionState.newHadoopConf())
    val v = committedVersions(fs,
      new org.apache.hadoop.fs.Path(statePath)).sorted.lastOption
      .getOrElse(sys.error(s"no committed merge state under $statePath"))
    spark.read.parquet(s"$statePath/v=$v")
  }

  /** One split of the events table into 4 parquet files per sfDir, so
    * the file source delivers a genuine MULTI-batch stream
    * (maxFilesPerTrigger=1 → 4 micro-batches, 4 chained merge steps)
    * instead of collapsing the whole table into one batch. Built once
    * per sfDir per JVM — the final merged state is batching-invariant
    * (per-user sums are associative), which is exactly what the oracle
    * gate checks. */
  private val splitCache =
    new scala.collection.concurrent.TrieMap[String, String]()

  private def eventsSplit(s: SparkSession, d: String): String =
    splitCache.synchronized {
      splitCache.getOrElseUpdate(d, {
        val p = s"/tmp/graft_stream_split_${java.util.UUID.randomUUID()}"
        graft.io.Tables.load(s, d, "events").select("user_id", "value")
          .repartition(4).write.mode("overwrite").parquet(p)
        // scratch: reused for the whole JVM, deleted at exit
        sys.addShutdownHook {
          def del(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
          }
          del(new java.io.File(p))
        }
        p
      })
    }

  /** Drive one merge-sink flavor over the 4-file micro-batch stream,
    * read its final state, and CLEAN UP the run's scratch: state and
    * checkpoint dirs are per-invocation (globally UUID-unique — a
    * reused checkpoint from an earlier process would resume ITS
    * file-source log instead of streaming this split), so repeated
    * bench/verify runs must not grow /tmp without bound. The state is
    * localCheckpointed into block storage BEFORE deletion so the
    * returned frame stays valid. */
  private def runMergeStream(s: SparkSession, d: String,
      sink: (DataFrame, String, String) =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row],
      read: (SparkSession, String) => DataFrame): DataFrame = {
    graft.io.Tables.ensureSessionRegistered(s)
    val src = eventsSplit(s, d)
    val runId = java.util.UUID.randomUUID()
    val state = s"/tmp/graft_merge_state_$runId"
    val ckpt = s"/tmp/graft_merge_ckpt_$runId"
    val schema = s.read.parquet(src).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = sink(stream, state, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val out = read(s, state).orderBy("user_id").localCheckpoint(true)
    for (p <- Seq(state, ckpt)) {
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(p),
        s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
    out
  }

  /** Oracle-gated run of the MERGE upsert sink (VERDICT r9 next #6,
    * second streaming row): events stream through
    * [[mergeUpsertSink]]'s foreachBatch version-chain merge in 4
    * micro-batches — each step full-outer-merges the batch's per-user
    * delta into the newest committed state version and writes the next
    * version — and the FINAL committed state is the result. The DuckDB
    * oracle is the whole-table aggregate, so the gate checks that 4
    * chained incremental merges land value-exactly on the batch
    * answer: the exactly-once versioning (replay reads newest v <
    * batchId, never its own output) composed across a real micro-batch
    * sequence, not a single-step spec fixture.
    *
    * Scale posture: state rewrite per batch is the flat chain's
    * O(|state|) — the bucketed sibling ([[qStreamMergeBucketed]]) is
    * the 100 TB shape; this gate runs the flat chain because its read
    * surface is one directory. */
  val qStreamMerge: graft.queries.Q = graft.queries.Q("q_stream_merge",
    """SELECT user_id, COUNT(*) AS n,
      |       CAST(COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT)), 0)
      |            AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    runMergeStream(s, d, mergeUpsertSink(_, _, _), readMergedState)
  }

  /** [[qStreamMerge]]'s BUCKETED sibling — the 100 TB merge shape gets
    * its own oracle row: the same 4-file micro-batch stream drives
    * [[mergeUpsertSinkBucketed]] (8 hash buckets, each with its own
    * version chain; a batch rewrites ONLY the buckets its delta keys
    * hash into), and the result is [[readBucketedState]]'s union of
    * per-bucket newest committed versions. The oracle is the identical
    * whole-table aggregate, so the gate checks that per-bucket chains +
    * partial rewrites compose to the exact batch answer — O(touched)
    * rewrite cost with zero correctness discount. */
  val qStreamMergeBucketed: graft.queries.Q =
    graft.queries.Q("q_stream_merge_bucketed",
      """SELECT user_id, COUNT(*) AS n,
        |       CAST(COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT)), 0)
        |            AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      runMergeStream(s, d,
        mergeUpsertSinkBucketed(_, _, _, buckets = 8), readBucketedState)
    }

  /** The streaming family's registered (oracle-gated) queries; the
    * remaining operators above are spec-gated batch/stream twins. */
  val all: Seq[graft.queries.Q] =
    Seq(qStreamHourly, qStreamMerge, qStreamMergeBucketed)
}
