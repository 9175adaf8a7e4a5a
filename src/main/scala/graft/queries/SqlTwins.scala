package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextHash
import graft.io.Tables
import graft.model.Schemas

/** SQL-string surface for the full operator registry.
  *
  * The reference is driven entirely by SQL text (reference
  * sql/queries.sql:1-33 executed statement-by-statement by
  * src/job.py:263-271); a user migrating from it has SQL, not Scala. This
  * object gives every registered operator a Spark-SQL "twin": the same
  * result as the DataFrame program, runnable via `spark.sql` against temp
  * views of the same tables. `SqlTwinsSpec` asserts row-for-row parity for
  * the whole registry.
  *
  * Twin sources, in order:
  *   - most oracle SQL is ANSI enough to run on Spark after a mechanical
  *     dialect mapping ([[dialect]]: DuckDB list functions → Spark
  *     higher-order functions, `::` casts → CAST, `epoch_us` →
  *     `unix_micros`, …);
  *   - the text/hash-pipeline queries get hand-written Spark SQL built from
  *     the same Scala snippet builders as the engine (the session-registered
  *     native functions `graft_md5_mod31` / `graft_dot` are callable from
  *     SQL, so the twins share the engine's exact hash/dot semantics);
  *   - one documented skip ([[skips]]).
  */
object SqlTwins {

  /** Register every driver table as a temp view (and, via
    * [[Tables.load]], the graft native functions on the session). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Schemas.testTables.foreach { t =>
      if (Tables.exists(spark, sfDir, t))
        Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Queries with no single-statement SQL twin, with the reason. */
  val skips: Map[String, String] = Map(
    "q_stream_hourly" ->
      ("micro-batch Structured Streaming pipeline (readStream -> memory " +
        "sink); a SQL string cannot start a streaming query, and its " +
        "batch SQL is already registered as q_tumbling_hour"),
    "q_stream_merge" ->
      ("micro-batch MERGE sink (readStream -> foreachBatch version-chain " +
        "merge); a SQL string cannot start a streaming query, and its " +
        "batch aggregate is the q_merge_upsert/CDC family's surface"),
    "q_stream_merge_bucketed" ->
      ("micro-batch bucketed MERGE sink (per-bucket version chains, " +
        "partial rewrites); same streaming-query limitation as " +
        "q_stream_merge"),
    "q_stream_sessionize" ->
      ("micro-batch flatMapGroupsWithState run (readStream -> interval " +
        "state -> append memory sink); a SQL string cannot start a " +
        "streaming query, and its batch SQL surface is q_sessionize's " +
        "registered twin"),
    "q_stream_conversion_lag" ->
      ("micro-batch flatMapGroupsWithState run (watermark-sealed " +
        "first-view/first-purchase state); same streaming-query " +
        "limitation, batch SQL surface is q_conversion_lag's twin"),
    "q_stream_dedup_ingest" ->
      ("micro-batch foreachBatch screen->fold ingest over a version-" +
        "chained banding index; a SQL string cannot start a streaming " +
        "query, and the batch SQL surface of the same chain is " +
        "q_dedup_index_update3's registered twin"),
    "q_stream_ann_ingest" ->
      ("micro-batch foreachBatch IVF fold over a version-chained cell " +
        "index; a SQL string cannot start a streaming query, and the " +
        "batch SQL surface of the same chain is q_ann_index_update3's " +
        "dialect-mapped oracle"),
    "q_stream_ingest_restart" ->
      ("the crash-restart exactly-once gate: two real StreamingQuery " +
        "legs (injected mid-chain kill, fresh query from the same " +
        "checkpoint); a SQL string cannot start — let alone kill and " +
        "resume — a streaming query, and its result surface is " +
        "q_stream_dedup_ingest's chain whose batch SQL twin is " +
        "q_dedup_index_update3's"),
    "q_stream_retune_ingest" ->
      ("the in-stream maintenance gate: a real StreamingQuery whose " +
        "sink runs the occupancy monitor between micro-batches and " +
        "swaps the index version mid-chain; a SQL string cannot start " +
        "a streaming query, and the decision arithmetic's batch SQL " +
        "surface is q_dedup_occupancy's twin"),
    "q_stream_retrain_ingest" ->
      ("the ANN in-stream maintenance gate: a real StreamingQuery whose " +
        "sink runs the cell-balance monitor between micro-batches and " +
        "retrains the quantizer mid-chain; a SQL string cannot start a " +
        "streaming query, and its from-scratch surface is the value-" +
        "gated variant of q_ann_lifecycle's (decision recomputed in " +
        "SQL, r14), whose batch twin is the unrolled-Lloyd spelling"),
    "q_stream_image_ingest" ->
      ("the streaming image-ingest chain (dHash delta screen + fold " +
        "under a real StreamingQuery); a SQL string cannot start a " +
        "streaming query, and the same two-phase admission's batch SQL " +
        "surface is q_image_index_update's hand-written twin"),
    "q_stream_resize_ingest" ->
      ("the derived-SIZE quantizer rebuild under the live stream (the " +
        "chain consuming q_ann_cells_update's grew flag, r14); a SQL " +
        "string cannot start a streaming query, and the sizing " +
        "arithmetic's batch SQL surface is q_ann_cells_update's " +
        "registered twin with the Lloyd rounds under q_ann_lifecycle's"),
    "q_stream_calibrate_ingest" ->
      ("the probe width riding the version chain (resize + " +
        "recalibrate in one maintenance batch, r14); a SQL string " +
        "cannot start a streaming query, and the calibration " +
        "arithmetic's batch SQL surface is q_ann_probe_auto's " +
        "registered twin (need-ranks + clamp) over the Lloyd family's " +
        "oracle CTEs"),
    "q_dedup_components" ->
      ("iterative label propagation (driver-side loop over checkpoints); " +
        "the recursive-CTE spelling needs UNION-distinct recursion to " +
        "terminate on cyclic edge sets, which Spark's recursive CTEs " +
        "(UNION ALL) do not support"),
    "q_dedup_components_star" ->
      ("iterative large-star/small-star rounds (driver-side loop over " +
        "checkpoints); same recursion limitation as q_dedup_components"),
    "q_dedup_cluster_sizes" ->
      ("aggregates the iterative star-CC labels (driver-side loop over " +
        "checkpoints); same recursion limitation as q_dedup_components"),
    "q_dedup_resolve_capped" ->
      ("iterative large-star/small-star rounds over the df-capped pair " +
        "graph (driver-side loop over checkpoints); same recursion " +
        "limitation as q_dedup_components — the capped PAIR surface is " +
        "q_jaccard_pairs_capped's registered twin"),
    "q_dedup_resolve_autocap" ->
      ("iterative large-star/small-star rounds over the DERIVED-cap " +
        "pair graph (driver-side loop over checkpoints); same recursion " +
        "limitation as q_dedup_components — the derived-cap PAIR " +
        "surface is q_jaccard_pairs_autocap's registered twin"),
    "q_image_dedup_resolve" ->
      ("iterative large-star/small-star rounds over the dHash near-dup " +
        "pair graph (driver-side loop over checkpoints); same recursion " +
        "limitation as q_dedup_components — the verified PAIR surface " +
        "is q_image_dhash_pairs's hand-written twin"),
    "q_dedup_keep_best" ->
      ("ranks within the iterative star-CC clusters (driver-side loop " +
        "over checkpoints); same recursion limitation as " +
        "q_dedup_components"),
    "q_curation_funnel" ->
      ("its near-dup stage consumes the iterative star-CC clusters " +
        "(driver-side loop over checkpoints); same recursion " +
        "limitation as q_dedup_components"),
    "q_curation_funnel_seq" ->
      ("sequential-domain funnel twin — consumes the same iterative " +
        "star-CC clusters as q_curation_funnel; same recursion " +
        "limitation as q_dedup_components"),
    "q_kcore_converged" ->
      ("run-to-convergence peel (driver-side count-gated loop); the " +
        "oracle's change-gated recursive CTE references the working " +
        "table multiple times in the recursive term, which Spark's " +
        "recursive CTEs do not support"),
    "q_bfs_converged" ->
      ("BFS to frontier exhaustion (driver-side loop); same " +
        "change-gated-recursion limitation as q_kcore_converged"),
    "q_pagerank_converged" ->
      ("rank iteration to tolerance (driver-side loop); same " +
        "change-gated-recursion limitation as q_kcore_converged"),
    "q_kmeans_converged" ->
      ("Lloyd iteration to the centroid fixed point (driver-side " +
        "loop over collected k×64 centroids); same change-gated-" +
        "recursion limitation as q_kcore_converged"))

  /** Mechanical DuckDB→Spark dialect mapping for the near-ANSI oracles.
    * Harmless on already-ANSI text; the hash/text queries that need more
    * than token-level mapping live in [[overrides]] instead. */
  private def dialect(sql: String): String = {
    var s = sql
    s = s.replace("END IGNORE NULLS)", "END) IGNORE NULLS")
    s = s.replace("AS VARCHAR)", "AS STRING)")
    // DuckDB's 128-bit integer → Spark's widest exact integer type
    s = s.replace("AS HUGEINT)", "AS DECIMAL(38,0))")
    s = s.replace(" // ", " div ") // integer floor division
    // the hash32Sql idiom → the native expression (before the generic
    // ::BIGINT rule, which would only mangle its tail)
    s = s.replaceAll(
      """\('0x' \|\| substring\(md5\(([^()]+)\), 1, 8\)\)::BIGINT % 2147483647""",
      "graft_md5_mod31($1)")
    s = s.replace("epoch_us(", "unix_micros(")
    s = s.replace("json_extract_string(", "get_json_object(")
    s = s.replace("quantile_cont(", "percentile(")
    s = s.replace("regexp_matches(", "regexp_like(")
    s = s.replace("list_dot_product(", "graft_dot(")
    s = s.replace("unnest(", "explode(")
    s = s.replace("string_split(", "split(")
    s = s.replaceAll("""\blen\s*\(""", "size(")
    s = s.replace("embedding::DOUBLE[]", "CAST(embedding AS ARRAY<DOUBLE>)")
    s = s.replaceAll("""\[([^\[\]]+)\]::DOUBLE\[\]""", "array($1)")
    s = s.replaceAll("""explode\(\[([^\[\]]+)\]\)""", "explode(array($1))")
    s = s.replaceAll("""(\w+)::BIGINT""", "CAST($1 AS BIGINT)")
    s = s.replaceAll("""xor\(([^(),]+),\s*([^()]+)\)""", "($1 ^ $2)")
    s = s.replaceAll("""dayname\(([^()]+)\)""", "date_format($1, 'EEEE')")
    s
  }

  // ---- Spark-dialect snippet builders (twins of graft.functions.TextHash
  // builders; the hash itself is the session-registered native function, so
  // twin and engine share one implementation) ----

  private val P = TextHash.P
  private val B = TextHash.B

  /** tokens → token hashes → distinct 3-shingle hashes, as Spark SQL CTEs
    * binding `sh(doc_id, hs)`. Mirrors [[TextHash.shingleCteSql]] with
    * 0-based array indexing. */
  private val shingleCte: String =
    s"""words AS (SELECT doc_id, text, split(text, ' ') AS w FROM documents),
       |th AS (SELECT doc_id, transform(w, t -> graft_md5_mod31(t)) AS t
       |       FROM words),
       |sh AS (SELECT doc_id,
       |  CASE WHEN size(t) >= 3 THEN array_distinct(transform(
       |    sequence(0, size(t) - 3),
       |    i -> ((t[i]*$B + t[i+1]) % $P * $B + t[i+2]) % $P))
       |  ELSE CAST(array() AS ARRAY<BIGINT>) END AS hs FROM th)"""
      .stripMargin

  /** Spark spelling of [[graft.dedup.Dedup.simhash62]]'s bit votes. */
  private def simhash62Sql(hs: String, hs2: String): String =
    (0 until 62).map { j =>
      val (arr, bit) = if (j < 31) (hs, j) else (hs2, j - 31)
      s"(CASE WHEN aggregate($arr, CAST(0 AS BIGINT), " +
        s"(acc, h) -> acc + ((shiftright(h, $bit) & 1)*2 - 1)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  private val wideRehash =
    s"transform(hs, h -> (CAST(${graft.dedup.Dedup.WideA} AS BIGINT) * h" +
      s" + ${graft.dedup.Dedup.WideB}) % $P)"

  /** Spark spelling of the unrolled 3-round Lloyd over int8 codes
    * (the q_kmeans twin's chain, shared with the cell-balance twin —
    * one spelling, mirroring the oracle side's `lloydCellsCteSql`
    * discipline): expects `e` (vec_id, ARRAY<DOUBLE> v) bound; binds
    * `s3` (vec_id, cl, d2). Long-form posexplode spelling because the
    * twin surface avoids the engine's literal-centroid arrays. */
  private lazy val lloydTwinCte: String =
    """m AS (SELECT vec_id, v,
      |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
      |c AS (SELECT vec_id,
      |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
      |          AS c
      |      FROM m),
      |x AS (SELECT vec_id, pos, val
      |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
      |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM x
      |          WHERE vec_id < 8),
      |d1 AS (SELECT x.vec_id, cent0.cl,
      |         SUM((x.val - cent0.m) * (x.val - cent0.m)) AS d2
      |       FROM x JOIN cent0 ON cent0.pos = x.pos GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cl,
      |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
      |           AS rn
      |       FROM d1),
      |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
      |cent1 AS (SELECT s1.cl, x.pos,
      |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
      |                 AS BIGINT) AS m
      |          FROM x JOIN s1 ON s1.vec_id = x.vec_id GROUP BY 1, 2),
      |d2r AS (SELECT x.vec_id, cent1.cl,
      |          SUM((x.val - cent1.m) * (x.val - cent1.m)) AS d2
      |        FROM x JOIN cent1 ON cent1.pos = x.pos GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, cl,
      |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
      |           AS rn
      |       FROM d2r),
      |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
      |cent2 AS (SELECT s2.cl, x.pos,
      |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
      |                 AS BIGINT) AS m
      |          FROM x JOIN s2 ON s2.vec_id = x.vec_id GROUP BY 1, 2),
      |d3 AS (SELECT x.vec_id, cent2.cl,
      |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
      |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
      |a3 AS (SELECT vec_id, cl, d2,
      |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
      |           AS rn
      |       FROM d3),
      |s3 AS (SELECT vec_id, cl, d2 FROM a3 WHERE rn = 1)""".stripMargin

  /** Spark spelling of the df pre-pass (`Dedup.dfCapCteSql`'s twin):
    * expects `sh` bound; binds `exd`/`dfh`/`dhist`/`dcum`/`dnd`. The
    * volume sum runs in DECIMAL(38,0) and the fits comparison
    * decimal-vs-decimal, matching `capStatsFromDf`'s overflow-proof
    * arithmetic (ADVICE r12) — Spark SQL's BIGINT SUM wraps silently
    * where DuckDB's widens to hugeint. */
  private lazy val dfCapTwinCtes: String =
    """exd AS (SELECT doc_id, explode(hs) AS h FROM sh),
      |dfh AS (SELECT h, COUNT(*) AS df FROM exd GROUP BY 1),
      |dhist AS (SELECT df, COUNT(*) AS nh FROM dfh GROUP BY 1),
      |dcum AS (SELECT df, nh,
      |        SUM(CAST(nh AS DECIMAL(38,0)) * df * (df - 1))
      |          OVER (ORDER BY df) AS v2
      |      FROM dhist),
      |dnd AS (SELECT COUNT(*) AS n_docs FROM sh)""".stripMargin

  private lazy val CapB = graft.dedup.Dedup.JacCapBudgetPerDoc

  private lazy val derivedCapTwinSql: String =
    s"""COALESCE(MAX(CASE WHEN c.v2 <=
       |                    CAST(2 * $CapB AS DECIMAL(38,0)) * nd.n_docs
       |                  THEN c.df END), 0)""".stripMargin

  /** Shared SELECT head of the capstat twins (from-scratch + folded). */
  private lazy val capstatTwinSelect: String =
    s"""SELECT CAST(nd.n_docs AS BIGINT) AS n_docs,
       |       CAST(SUM(c.nh) AS BIGINT) AS n_shingles,
       |       CAST(MAX(c.df) AS BIGINT) AS max_df,
       |       CAST(MAX(c.v2) div 2 AS BIGINT) AS v_total,
       |       CAST(nd.n_docs * $CapB AS BIGINT) AS budget,
       |       CAST($derivedCapTwinSql AS BIGINT) AS derived_cap,
       |       $derivedCapTwinSql < MAX(c.df) AS capped""".stripMargin

  private def minhashSql(hs: String, k: Int): String =
    s"array_min(transform($hs, h -> (CAST(${TextHash.As(k)} AS BIGINT) * h" +
      s" + ${TextHash.Bs(k)}) % $P))"

  private def simhashSql(hs: String): String =
    (0 until 32).map { j =>
      s"(CASE WHEN aggregate($hs, CAST(0 AS BIGINT), " +
        s"(acc, h) -> acc + ((shiftright(h, $j) & 1)*2 - 1)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  private val tokenChars =
    "aggregate(split(text, ' '), CAST(0 AS BIGINT), " +
      "(acc, t) -> acc + CAST(length(t) AS BIGINT))"

  private val stopList = "('a', 'the', 'of', 'and', 'to', 'in', 'is', 'it')"

  /** Shared exact-Jaccard pair pipeline (inverted shingle index); callers
    * apply their threshold over `pairs`. */
  private def jaccardPairsSql: String =
    s"""WITH $shingleCte,
       |ex AS (SELECT doc_id, CAST(size(hs) AS BIGINT) AS n,
       |              explode(hs) AS h FROM sh),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
       |         COUNT(*) AS inter
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  private val qualityCase: String =
    s"""(CASE WHEN length(text) BETWEEN 100 AND 1000 THEN 1 ELSE 0 END
       | + CASE WHEN CAST($tokenChars AS DOUBLE) / size(split(text, ' '))
       |        BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END
       | + CASE WHEN CAST(size(filter(split(text, ' '),
       |          t -> t IN $stopList)) AS DOUBLE)
       |        / size(split(text, ' ')) > 0.02 THEN 1 ELSE 0 END
       | + CASE WHEN CAST(size(regexp_extract_all(text, '[^a-z0-9 ]', 0))
       |          AS DOUBLE) / length(text) < 0.05 THEN 1 ELSE 0 END) / 4.0"""
      .stripMargin

  // ---- hand-written twins ----

  /** Spark-dialect dHash derivation (generator → box-sum cells → bits →
    * 16-bit band keys → packed kk row per image) — ONE spelling shared
    * by the three image-dedup twins (pair gate, delta screen, index
    * update), mirroring the engine oracles' shared `dhashOracleCtes`.
    * Binds CTEs `dims/imgs/cells/bits/keys/kk`. */
  private val dhashSparkCtes: String =
    s"""dims AS (SELECT doc_id, text, length(text) AS L,
       |        48 + doc_id % 24 AS sw, 32 + doc_id % 16 AS sh_
       |      FROM documents),
       |imgs AS (
       |  SELECT doc_id * 2 AS img_id, sw AS iw, sh_ AS ih, sw, sh_,
       |         text, L
       |  FROM dims
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, sw + 3, sh_ + 2, sw, sh_, text, L
       |  FROM dims WHERE doc_id % 10 = 4),
       |cells AS (
       |  SELECT img_id, r, c,
       |    aggregate(transform(sequence(y1, y2 - 1), yy ->
       |      aggregate(transform(sequence(x1, x2 - 1), xx ->
       |        CAST(ascii(substring(text,
       |          CAST( (((yy * sh_) div ih) div 3) * 16
       |            + (((xx * sw) div iw) div 3) AS INT) % CAST(L AS INT)
       |            + 1, 1)) AS BIGINT)),
       |        CAST(0 AS BIGINT), (a, x) -> a + x)),
       |      CAST(0 AS BIGINT), (a, x) -> a + x) AS s,
       |    (x2 - x1) * (y2 - y1) AS n
       |  FROM (SELECT i.*, rr.r, cc.c,
       |          (cc.c * iw) div 9 AS x1,
       |          GREATEST((cc.c * iw) div 9 + 1,
       |                   ((cc.c + 1) * iw) div 9) AS x2,
       |          (rr.r * ih) div 8 AS y1,
       |          GREATEST((rr.r * ih) div 8 + 1,
       |                   ((rr.r + 1) * ih) div 8) AS y2
       |        FROM imgs i
       |        CROSS JOIN (SELECT explode(sequence(0, 7)) AS r) rr
       |        CROSS JOIN (SELECT explode(sequence(0, 8)) AS c) cc)),
       |bits AS (
       |  SELECT a.img_id, a.r * 8 + a.c AS k,
       |    CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON b.img_id = a.img_id AND b.r = a.r AND b.c = a.c + 1
       |  WHERE a.c < 8),
       |keys AS (SELECT img_id, k div 16 AS band,
       |         SUM(CAST(bit AS BIGINT)
       |             * shiftleft(CAST(1 AS BIGINT),
       |                         CAST(k % 16 AS INT))) AS key
       |         FROM bits GROUP BY 1, 2),
       |kk AS (SELECT img_id,
       |        MAX(CASE WHEN band = 0 THEN key END) AS k0,
       |        MAX(CASE WHEN band = 1 THEN key END) AS k1,
       |        MAX(CASE WHEN band = 2 THEN key END) AS k2,
       |        MAX(CASE WHEN band = 3 THEN key END) AS k3
       |      FROM keys GROUP BY 1)""".stripMargin

  private val overrides: Map[String, String] = Map(
    // HLL registers: sequence()/explode() for the bucket frame and
    // shiftleft() for the power of two (DuckDB spells them range/unnest
    // and <<); the hash is the session-registered native expression
    "q_hll_distinct" ->
      """WITH b AS (SELECT hv % 64 AS bucket,
        |             CASE WHEN hv div 64 = 0 THEN 26
        |                  ELSE 26 - length(bin(hv div 64)) END AS r
        |           FROM (SELECT graft_md5_mod31(CAST(user_id AS STRING))
        |                          AS hv FROM events)),
        |mx AS (SELECT bucket, MAX(r) AS mr FROM b GROUP BY 1),
        |g AS (SELECT explode(sequence(0, 63)) AS bucket),
        |reg AS (SELECT g.bucket, COALESCE(mx.mr, 0) AS mj
        |        FROM g LEFT JOIN mx ON mx.bucket = g.bucket),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |               CAST(SUM(shiftleft(CAST(1 AS BIGINT), 26 - mj))
        |                    AS BIGINT) AS s_scaled
        |        FROM reg)
        |SELECT m, s_scaled,
        |       194908456023.296 / CAST(s_scaled AS DOUBLE) AS est,
        |       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
        |         AS n_true
        |FROM agg""".stripMargin,

    // the md5 idiom's argument contains parens (CAST(...)), which the
    // dialect regex cannot rewrite — use the native hash directly
    "q_systematic_sample" ->
      """WITH v AS (SELECT o_orderkey,
        |        graft_md5_mod31(CAST(o_orderkey AS STRING)) AS hv,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders),
        |r AS (SELECT o_orderkey, hv, cents,
        |        CAST(ROW_NUMBER() OVER (ORDER BY hv, o_orderkey)
        |          AS BIGINT) AS rnk,
        |        CAST(COUNT(*) OVER () AS BIGINT) AS n
        |      FROM v)
        |SELECT rnk, o_orderkey, cents
        |FROM r WHERE (rnk - 1) % GREATEST(n div 100, 1) = 0
        |ORDER BY rnk""".stripMargin,

    // the q_hll_distinct register spelling, keyed by hour
    "q_hll_hourly" ->
      """WITH ev AS (SELECT unix_micros(ts) div 3600000000 AS hour,
        |              user_id
        |            FROM events),
        |b AS (SELECT hour, hv % 64 AS bucket,
        |        CASE WHEN hv div 64 = 0 THEN 26
        |             ELSE 26 - length(bin(hv div 64)) END AS r
        |      FROM (SELECT hour,
        |              graft_md5_mod31(CAST(user_id AS STRING)) AS hv
        |            FROM ev)),
        |mx AS (SELECT hour, bucket, MAX(r) AS mr FROM b GROUP BY 1, 2),
        |hrs AS (SELECT DISTINCT hour FROM ev),
        |g AS (SELECT h.hour, gg.bucket FROM hrs h
        |      CROSS JOIN (SELECT explode(sequence(0, 63)) AS bucket) gg),
        |reg AS (SELECT g.hour, COALESCE(mx.mr, 0) AS mj
        |        FROM g LEFT JOIN mx ON mx.hour = g.hour
        |                           AND mx.bucket = g.bucket),
        |agg AS (SELECT hour,
        |          CAST(SUM(shiftleft(CAST(1 AS BIGINT), 26 - mj))
        |               AS BIGINT) AS s_scaled
        |        FROM reg GROUP BY hour),
        |nt AS (SELECT hour, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |         AS n_true
        |       FROM ev GROUP BY hour)
        |SELECT a.hour, a.s_scaled,
        |       194908456023.296 / CAST(a.s_scaled AS DOUBLE) AS est,
        |       nt.n_true
        |FROM agg a JOIN nt ON nt.hour = a.hour
        |ORDER BY a.hour""".stripMargin,

    // DuckDB's 1-based list index `[1]` → element_at
    "q_fuzzy_linkage" ->
      """WITH p AS (SELECT p_partkey, p_name,
        |             element_at(split(p_name, ' '), 1) AS blk FROM part)
        |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |       a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
        |  AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
        |ORDER BY key_a, key_b""".stripMargin,

    // Spark SQL has no IN-subquery in the SELECT list (predicate
    // subqueries are filter-only) — membership flags become LEFT JOINs
    // against the distinct bit/key sets; same md5 positions via the
    // native expression
    "q_bloom_join" ->
      """WITH vip AS (SELECT c_custkey FROM customer
        |             WHERE c_acctbal > 9000),
        |vh AS (SELECT graft_md5_mod31(CAST(c_custkey AS STRING)) AS h
        |       FROM vip),
        |bits AS (SELECT DISTINCT pos FROM (
        |  SELECT (1299721 * h + 7) % 4096 AS pos FROM vh
        |  UNION ALL SELECT (15485863 * h + 11) % 4096 AS pos FROM vh)),
        |probe AS (SELECT o_orderpriority AS priority, o_custkey,
        |            graft_md5_mod31(CAST(o_custkey AS STRING)) AS h
        |          FROM orders),
        |flags AS (SELECT p.priority,
        |            (b1.pos IS NOT NULL AND b2.pos IS NOT NULL) AS bloom_hit,
        |            (v.c_custkey IS NOT NULL) AS true_hit
        |          FROM probe p
        |          LEFT JOIN bits b1 ON (1299721 * p.h + 7) % 4096 = b1.pos
        |          LEFT JOIN bits b2 ON (15485863 * p.h + 11) % 4096 = b2.pos
        |          LEFT JOIN vip v ON p.o_custkey = v.c_custkey)
        |SELECT priority, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bloom_pass,
        |  CAST(SUM(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT)
        |    AS true_match,
        |  CAST(SUM(CASE WHEN bloom_hit AND NOT true_hit THEN 1 ELSE 0 END)
        |       AS BIGINT) AS false_pos
        |FROM flags GROUP BY priority ORDER BY priority""".stripMargin,

    // Spark datediff is 2-arg (end, start); DuckDB's is ('day', start,
    // end)
    "q_rolling_7d" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |                 CAST(o_orderdate AS DATE) AS day,
        |                 datediff(CAST(o_orderdate AS DATE),
        |                          DATE '1990-01-01') AS dk,
        |                 CAST(COUNT(*) AS BIGINT) AS n,
        |                 CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        |                      AS BIGINT) AS cents
        |               FROM orders GROUP BY 1, 2, 3)
        |SELECT pri, day, n, cents,
        |       CAST(SUM(cents) OVER w AS BIGINT) AS cents_7d,
        |       CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
        |       CAST(first_value(day) OVER w AS DATE) AS win_first_day
        |FROM daily
        |WINDOW w AS (PARTITION BY pri ORDER BY dk
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY pri, day""".stripMargin,

    // DuckDB's ordered string_agg(DISTINCT … ORDER BY) → deterministic
    // sorted-set spelling
    "q_group_concat" ->
      """SELECT lang,
        |       array_join(sort_array(collect_set(source)), ',') AS sources,
        |       COUNT(*) AS n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // DuckDB's aligned multi-unnest → Spark's posexplode generator
    "q_posexplode_tokens" ->
      """SELECT doc_id, pos, token
        |FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, token)
        |      FROM documents WHERE doc_id < 40)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  date_add(CAST(o_orderdate AS DATE), 30) AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_string_functions" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  CAST(length(p_name) AS INT) AS len,
        |  substring(p_name, 1, 5) AS pre5,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  lpad(CAST(p_size AS STRING), 4, '0') AS size_padded,
        |  reverse(p_brand) AS brand_rev,
        |  CAST(instr(p_name, 'a') AS INT) AS first_a,
        |  p_brand || ':' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_array_functions" ->
      """WITH t AS (SELECT doc_id, split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(size(w) AS INT) AS n_tokens,
        |  sort_array(w)[0] AS first_sorted,
        |  array_contains(w, 'the') AS has_the,
        |  COALESCE(CAST(array_position(w, 'the') AS INT), 0) AS pos_the,
        |  array_join(slice(w, 1, 5), '-') AS head_joined,
        |  CAST(size(filter(w, x -> length(x) > 5)) AS INT) AS n_long,
        |  CAST(array_min(transform(w, x -> length(x))) AS INT) AS min_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_date_cast_roundtrip" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_format(l_shipdate, 'yyyy/MM/dd') AS daily_raw,
        |  to_date(date_format(l_shipdate, 'yyyy/MM/dd'), 'yyyy/MM/dd')
        |    AS daily,
        |  CAST(NULL AS DATE) AS daily_fallback
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_numeric_columns" ->
      """SELECT * FROM VALUES
        |  ('l_orderkey', 1, FALSE), ('l_partkey', 2, FALSE),
        |  ('l_suppkey', 3, FALSE), ('l_linenumber', 4, FALSE),
        |  ('l_quantity', 5, TRUE), ('l_extendedprice', 6, FALSE),
        |  ('l_discount', 7, FALSE), ('l_tax', 8, FALSE)
        |  AS t(column_name, ordinal, is_measure)
        |ORDER BY ordinal""".stripMargin,

    // the q_hll_distinct register spelling, keyed by returnflag
    "q_approx_distinct" ->
      """WITH b AS (SELECT flag, hv % 64 AS bucket,
        |        CASE WHEN hv div 64 = 0 THEN 26
        |             ELSE 26 - length(bin(hv div 64)) END AS r
        |      FROM (SELECT l_returnflag AS flag,
        |              graft_md5_mod31(CAST(l_partkey AS STRING)) AS hv
        |            FROM lineitem)),
        |mx AS (SELECT flag, bucket, MAX(r) AS mr FROM b GROUP BY 1, 2),
        |fl AS (SELECT DISTINCT l_returnflag AS flag FROM lineitem),
        |g AS (SELECT f.flag, gg.bucket FROM fl f
        |      CROSS JOIN (SELECT explode(sequence(0, 63)) AS bucket) gg),
        |reg AS (SELECT g.flag, COALESCE(mx.mr, 0) AS mj
        |        FROM g LEFT JOIN mx ON mx.flag = g.flag
        |                           AND mx.bucket = g.bucket),
        |agg AS (SELECT flag,
        |          CAST(SUM(shiftleft(CAST(1 AS BIGINT), 26 - mj))
        |               AS BIGINT) AS s_scaled
        |        FROM reg GROUP BY 1),
        |nt AS (SELECT l_returnflag AS flag,
        |         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
        |       FROM lineitem GROUP BY 1)
        |SELECT a.flag AS l_returnflag, a.s_scaled,
        |       194908456023.296 / CAST(a.s_scaled AS DOUBLE) AS approx_est,
        |       nt.exact_parts
        |FROM agg a JOIN nt ON nt.flag = a.flag
        |ORDER BY l_returnflag""".stripMargin,

    "q_text_stats" ->
      s"""SELECT doc_id, lang, source, n_chars,
         |  CAST(length(text) AS BIGINT) AS n_chars_calc,
         |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(size(array_distinct(split(text, ' '))) AS BIGINT)
         |    AS n_distinct_tokens,
         |  $tokenChars AS token_chars,
         |  CAST($tokenChars AS DOUBLE) / size(split(text, ' '))
         |    AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_counts" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(size(split(text, ' ')) AS BIGINT)) AS BIGINT)
        |    AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    "q_quality_score" ->
      s"""WITH feats AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars_calc,
         |    CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $tokenChars AS token_chars,
         |    CAST(size(filter(split(text, ' '), t -> t IN $stopList))
         |      AS BIGINT) AS stop_hits,
         |    CAST(size(regexp_extract_all(text, '[^a-z0-9 ]', 0)) AS BIGINT)
         |      AS punct_chars
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, n_tokens, stop_hits, punct_chars,
         |    CASE WHEN n_chars_calc BETWEEN 100 AND 1000 THEN 1 ELSE 0 END
         |      AS len_ok,
         |    CASE WHEN CAST(token_chars AS DOUBLE) / n_tokens
         |              BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END AS token_len_ok,
         |    CASE WHEN CAST(stop_hits AS DOUBLE) / n_tokens > 0.02
         |         THEN 1 ELSE 0 END AS stopword_ok,
         |    CASE WHEN CAST(punct_chars AS DOUBLE) / n_chars_calc < 0.05
         |         THEN 1 ELSE 0 END AS punct_ok
         |  FROM feats)
         |SELECT doc_id, CAST(len_ok AS INT) AS len_ok,
         |       CAST(token_len_ok AS INT) AS token_len_ok,
         |       CAST(stopword_ok AS INT) AS stopword_ok,
         |       CAST(punct_ok AS INT) AS punct_ok,
         |       (len_ok + token_len_ok + stopword_ok + punct_ok) / 4.0D
         |         AS quality
         |FROM scored ORDER BY doc_id""".stripMargin,

    "q_lang_id" -> langIdTwin,

    // Spark regexp_replace is global by default (no 'g' flag argument)
    "q_pii_redact" ->
      """SELECT doc_id,
        |  CAST(size(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+', 0))
        |       AS BIGINT) AS n_emails,
        |  CAST(size(regexp_extract_all(text, '[0-9]{6,}', 0)) AS BIGINT)
        |    AS n_longnums,
        |  CAST(length(regexp_replace(regexp_replace(text,
        |         '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'), '[0-9]{6,}',
        |         '<NUM>')) AS BIGINT) AS clean_len,
        |  md5(regexp_replace(regexp_replace(text,
        |        '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'), '[0-9]{6,}',
        |        '<NUM>')) AS clean_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_split_hash" ->
      """WITH h AS (SELECT doc_id,
        |             CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |             graft_md5_mod31(text) % 100 AS bucket
        |           FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM h GROUP BY 1 ORDER BY split""".stripMargin,

    "q_train_order" ->
      s"""WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
         |h AS (SELECT e.epoch, d.doc_id,
         |        graft_md5_mod31(concat('ep', CAST(e.epoch AS STRING),
         |          ':', CAST(d.doc_id AS STRING))) AS h
         |      FROM documents d CROSS JOIN e)
         |SELECT epoch, CAST(h % ${graft.text.TextOps.TrainShards} AS BIGINT)
         |         AS shard,
         |       CAST(ROW_NUMBER() OVER (
         |              PARTITION BY epoch, h % ${graft.text.TextOps.TrainShards}
         |              ORDER BY h, doc_id) AS BIGINT) AS pos,
         |       doc_id
         |FROM h ORDER BY epoch, shard, pos""".stripMargin,

    "q_decontaminate" ->
      s"""WITH $shingleCte,
         |bench AS (SELECT DISTINCT h FROM (
         |            SELECT explode(hs) AS h FROM sh WHERE doc_id % 50 = 0)),
         |ex AS (SELECT doc_id, explode(hs) AS h FROM sh
         |       WHERE doc_id % 50 != 0)
         |SELECT DISTINCT e.doc_id AS contaminated_doc
         |FROM ex e JOIN bench b ON b.h = e.h
         |ORDER BY contaminated_doc""".stripMargin,

    "q_retention_cohorts" ->
      """WITH first AS (SELECT user_id,
        |                 CAST(date_trunc('week', MIN(ts)) AS DATE)
        |                 AS cohort_week FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |          CAST(datediff(CAST(date_trunc('week', e.ts) AS DATE),
        |            f.cohort_week) div 7 AS BIGINT) AS week_offset
        |        FROM events e JOIN first f ON f.user_id = e.user_id
        |        WHERE e.event_type = 'purchase')
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM act GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS day,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |           AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT k, MIN(day) AS lo, MAX(day) AS hi
        |           FROM daily GROUP BY 1),
        |cal AS (SELECT k, explode(sequence(lo, hi, interval 1 day)) AS day
        |        FROM bounds),
        |filled AS (
        |  SELECT c.k, c.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
        |         d.rev_cents
        |  FROM cal c LEFT JOIN daily d ON d.k = c.k AND d.day = c.day)
        |SELECT k, day, n,
        |  last(rev_cents) IGNORE NULLS OVER (
        |    PARTITION BY k ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS rev_cents_ffill
        |FROM filled ORDER BY k, day""".stripMargin,

    "q_record_linkage" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name,
        |             element_at(split(p_name, ' '), -1) AS blk FROM part),
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
        |FROM pairs GROUP BY 1, 2 ORDER BY p_brand, blk""".stripMargin,

    "q_decontaminate_containment" ->
      s"""WITH $shingleCte,
         |bench AS (SELECT DISTINCT h FROM (
         |            SELECT explode(hs) AS h FROM sh WHERE doc_id % 50 = 0)),
         |ex AS (SELECT doc_id, CAST(size(hs) AS BIGINT) AS n_shingles,
         |              explode(hs) AS h FROM sh WHERE doc_id % 50 != 0),
         |hits AS (SELECT e.doc_id, e.n_shingles, COUNT(*) AS n_hit
         |         FROM ex e JOIN bench b ON b.h = e.h GROUP BY 1, 2)
         |SELECT doc_id, n_shingles, n_hit,
         |  round(CAST(n_hit AS DOUBLE) / n_shingles, 6) AS containment
         |FROM hits ORDER BY doc_id""".stripMargin,

    "q_substring_dups" -> {
      val k = graft.dedup.Dedup.SubstrK
      val fold = (1 until k).foldLeft("t[i]") { (acc, j) =>
        s"(($acc * $B + t[i+$j]) % $P)"
      }
      s"""WITH words AS (SELECT doc_id, split(text, ' ') AS w
         |               FROM documents),
         |th AS (SELECT doc_id, transform(w, t -> graft_md5_mod31(t)) AS t
         |       FROM words),
         |ws AS (SELECT doc_id,
         |  CASE WHEN size(t) >= $k THEN transform(
         |    sequence(0, size(t) - $k), i -> $fold)
         |  ELSE CAST(array() AS ARRAY<BIGINT>) END AS ws FROM th),
         |ex AS (SELECT doc_id, explode(ws) AS h FROM ws),
         |dup AS (SELECT h FROM ex GROUP BY h
         |        HAVING COUNT(DISTINCT doc_id) >= 2),
         |per_doc AS (SELECT e.doc_id, COUNT(*) AS n_dup_windows
         |            FROM ex e JOIN dup d ON d.h = e.h GROUP BY 1)
         |SELECT w.doc_id, CAST(size(w.ws) AS BIGINT) AS n_windows,
         |  COALESCE(p.n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows
         |FROM ws w LEFT JOIN per_doc p ON p.doc_id = w.doc_id
         |WHERE size(w.ws) > 0 ORDER BY w.doc_id""".stripMargin
    },

    "q_winnow_fingerprint" -> {
      val k = graft.dedup.Dedup.WinnowK
      val w = graft.dedup.Dedup.WinnowW
      val shift = graft.dedup.Dedup.WinnowShift
      val fold = (1 until k).foldLeft("t[i]") { (acc, j) =>
        s"(($acc * $B + t[i+$j]) % $P)"
      }
      s"""WITH words AS (SELECT doc_id, split(text, ' ') AS w
         |               FROM documents),
         |th AS (SELECT doc_id, transform(w, t -> graft_md5_mod31(t)) AS t
         |       FROM words),
         |ws AS (SELECT doc_id,
         |  CASE WHEN size(t) >= $k THEN transform(
         |    sequence(0, size(t) - $k), i -> $fold)
         |  ELSE CAST(array() AS ARRAY<BIGINT>) END AS ws FROM th),
         |px AS (SELECT doc_id, CAST(size(ws) AS BIGINT) AS nh,
         |       posexplode(ws) AS (pos, h) FROM ws),
         |ck AS (SELECT doc_id, nh, CAST(pos AS BIGINT) AS pos,
         |       h * $shift + pos AS ck FROM px),
         |mn AS (SELECT doc_id, nh, pos, MIN(ck) OVER (
         |         PARTITION BY doc_id ORDER BY pos
         |         ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
         |       FROM ck),
         |sel AS (SELECT DISTINCT doc_id, nh, fp FROM mn
         |        WHERE pos <= greatest(nh - $w, CAST(0 AS BIGINT)))
         |SELECT doc_id, MAX(nh) AS n_windows,
         |  CAST(COUNT(*) AS BIGINT) AS n_fp,
         |  CAST(SUM(fp div $shift) AS BIGINT) AS fp_sum
         |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q_doc_sim_weighted" -> {
      val cap = graft.text.IndexOps.SimDfCap
      val clamp = graft.text.IndexOps.SimTfClamp
      val fold = (1 until 3).foldLeft("t[i]") { (acc, j) =>
        s"(($acc * $B + t[i+$j]) % $P)"
      }
      s"""WITH words AS (SELECT doc_id, split(text, ' ') AS w
         |               FROM documents),
         |th AS (SELECT doc_id, transform(w, t -> graft_md5_mod31(t)) AS t
         |       FROM words),
         |ws AS (SELECT doc_id,
         |  CASE WHEN size(t) >= 3 THEN transform(
         |    sequence(0, size(t) - 3), i -> $fold)
         |  ELSE CAST(array() AS ARRAY<BIGINT>) END AS ws FROM th),
         |ex AS (SELECT doc_id, explode(ws) AS h FROM ws),
         |tf AS (SELECT doc_id, h,
         |         CAST(least(COUNT(*), $clamp) AS BIGINT) AS tf
         |       FROM ex GROUP BY 1, 2),
         |df AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM tf
         |       GROUP BY 1 HAVING COUNT(*) <= $cap),
         |wt AS (SELECT tf.doc_id, tf.h,
         |         tf.tf * (${graft.text.IndexOps.SimIdfScale} div df.df)
         |           AS w
         |       FROM tf JOIN df ON df.h = tf.h),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared,
         |         CAST(SUM(a.w * b.w) AS BIGINT) AS dot
         |       FROM wt a JOIN wt b ON b.h = a.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_shared, dot FROM pr
         |ORDER BY dot DESC, doc_a, doc_b LIMIT 20""".stripMargin
    },

    "q_fingerprint" ->
      s"""WITH $shingleCte
         |SELECT d.doc_id, md5(d.text) AS content_md5,
         |  CAST(conv(substring(md5(d.text), 1, 15), 16, 10) AS BIGINT)
         |    AS fp60,
         |  array_min(sh.hs) AS min_shingle_hash
         |FROM documents d JOIN sh ON sh.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_ngram_jaccard_pairs" ->
      s"""$jaccardPairsSql
         |SELECT doc_a, doc_b, inter, na + nb - inter AS un,
         |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         |FROM pairs
         |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_near_removed" ->
      s"""$jaccardPairsSql
         |SELECT DISTINCT doc_b AS removed_doc
         |FROM pairs
         |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
         |ORDER BY removed_doc""".stripMargin,

    "q_jaccard_pairs_capped" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, explode(hs) AS h FROM sh),
         |kept AS (SELECT h FROM ex GROUP BY h
         |         HAVING COUNT(*) <= ${graft.dedup.Dedup.JacDfCap}),
         |exk AS (SELECT ex.doc_id, ex.h FROM ex JOIN kept ON kept.h = ex.h),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM exk a JOIN exk b ON a.h = b.h AND a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |       CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT)
         |         AS inter,
         |       CAST(size(sa.hs) + size(sb.hs)
         |            - size(array_intersect(sa.hs, sb.hs)) AS BIGINT) AS un,
         |       CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |         / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
         |            - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
         |         AS jaccard
         |FROM cand c
         |JOIN sh sa ON sa.doc_id = c.doc_a
         |JOIN sh sb ON sb.doc_id = c.doc_b
         |WHERE CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |        / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
         |           - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
         |      >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_jaccard_capstat" -> capstatTwin,
    "q_jaccard_pairs_autocap" -> autocapTwin,
    "q_capstat_update" -> capstatUpdateTwin,
    "q_dedup_occupancy" -> dedupOccupancyTwin,
    "q_ann_cell_stats" -> cellStatsTwin,

    "q_minhash_lsh_pairs" -> minhashLshTwin,

    "q_dedup_delta" -> dedupDeltaTwin,

    "q_dedup_index_update" -> dedupIndexUpdateTwin,
    "q_dedup_index_update3" -> dedupIndexUpdate3Twin,
    "q_dedup_reband" -> dedupRebandTwin,
    "q_dedup_lifecycle" -> dedupLifecycleTwin,

    // groups with the registered incremental aggregator (minhash_sig) —
    // the SQL surface exercises the same typed Aggregator as the
    // DataFrame program
    "q_minhash_incremental" -> {
      val ms = (0 until TextHash.K)
        .map(k => s"sig[$k] AS m$k").mkString(",\n       ")
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, explode(hs) AS h FROM sh),
         |g AS (SELECT doc_id, minhash_sig(h) AS sig FROM ex
         |      GROUP BY doc_id)
         |SELECT doc_id,
         |       $ms
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q_session_window" ->
      """SELECT user_id,
        |  session_window.start AS session_start,
        |  session_window.end AS session_end,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY user_id, session_window(ts, '30 minutes')
        |ORDER BY user_id, session_start""".stripMargin,

    "q_simhash_docs" ->
      s"""WITH $shingleCte
         |SELECT doc_id, CAST(${simhashSql("hs")} AS BIGINT) AS simhash
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q_simhash_pairs" -> simhashPairsTwin,

    "q_media_energy" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) AS n,
        |         length(text) + length(text) % 2 AS dl
        |  FROM documents WHERE doc_id % 3 = 2),
        |e AS (
        |  SELECT doc_id,
        |    transform(sequence(0, (dl + 15) div 16 - 1), f ->
        |      CAST(aggregate(transform(
        |        sequence(CAST(f*16 AS BIGINT),
        |                 least(CAST((f+1)*16 AS BIGINT),
        |                       CAST(n AS BIGINT)) - 1), i ->
        |          ascii(substring(text, CAST(i + 1 AS INT), 1))
        |          * ascii(substring(text, CAST(i + 1 AS INT), 1))),
        |        CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)) AS es
        |  FROM a)
        |SELECT doc_id,
        |  CAST(size(es) AS BIGINT) AS n_frames,
        |  CAST(aggregate(es, CAST(0 AS BIGINT), (acc, x) -> acc + x)
        |    AS BIGINT) AS total_energy,
        |  CAST(array_position(es, array_max(es)) - 1 AS BIGINT)
        |    AS peak_frame,
        |  CAST(array_max(es) AS BIGINT) AS peak_energy
        |FROM e ORDER BY doc_id""".stripMargin,

    "q_zorder_layout" ->
      s"""WITH xy AS (
         |  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         |         CAST(datediff(CAST(o_orderdate AS DATE),
         |                DATE '1995-01-01') % 256 AS BIGINT) AS y
         |  FROM orders),
         |m AS (SELECT x, y,
         |        (${graft.scale.Scale.mortonSql("x", "y")}) AS z FROM xy)
         |SELECT CAST(z div 256 AS BIGINT) AS tile, COUNT(*) AS n,
         |  CAST(MIN(x) AS BIGINT) AS min_x,
         |  CAST(MAX(x) AS BIGINT) AS max_x,
         |  CAST(MIN(y) AS BIGINT) AS min_y,
         |  CAST(MAX(y) AS BIGINT) AS max_y
         |FROM m GROUP BY 1 ORDER BY tile""".stripMargin,

    "q_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |         explode(sequence(CAST(0 AS BIGINT),
        |           CAST((size(toks) - 1) div 24 AS BIGINT))) AS ci
        |  FROM t),
        |ch AS (
        |  SELECT doc_id, ci,
        |         slice(toks, CAST(ci * 24 + 1 AS INT), 32) AS ck
        |  FROM c)
        |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
        |  CAST(size(ck) AS BIGINT) AS n_tokens,
        |  element_at(ck, 1) AS first_tok, element_at(ck, -1) AS last_tok,
        |  CAST(graft_md5_mod31(array_join(ck, ' ')) AS BIGINT) AS fp
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pmi_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |u AS (SELECT explode(toks) AS tok FROM t),
        |ux AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM u
        |       GROUP BY 1),
        |bg0 AS (SELECT explode(zip_with(
        |          slice(toks, 1, size(toks) - 1),
        |          slice(toks, 2, size(toks) - 1),
        |          (a, b) -> named_struct('x', a, 'y', b))) AS bg FROM t),
        |bg AS (SELECT bg.x AS x, bg.y AS y FROM bg0),
        |bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |nb AS (SELECT CAST(SUM(size(toks) - 1) AS BIGINT) AS nb FROM t)
        |SELECT b.x, b.y, b.n_xy, gx.n AS n_x, gy.n AS n_y,
        |  CAST(b.n_xy * nb.nb AS DOUBLE) / CAST(gx.n * gy.n AS DOUBLE)
        |    AS lift
        |FROM bc b JOIN ux gx ON gx.tok = b.x JOIN ux gy ON gy.tok = b.y
        |CROSS JOIN nb
        |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin,

    "q_media_pixels" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 24 AS INT) AS width,
        |  CAST(8 + doc_id % 16 AS INT) AS height,
        |  CAST(aggregate(transform(
        |    sequence(0, (8 + doc_id % 24) * (8 + doc_id % 16) - 1), j ->
        |      CAST(ascii(substring(text,
        |        CAST(j % length(text) + 1 AS INT), 1)) AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS px_sum,
        |  CAST(aggregate(transform(
        |    sequence(0, (8 + doc_id % 24) * (8 + doc_id % 16) - 1), j ->
        |      (j + 1) * CAST(ascii(substring(text,
        |        CAST(j % length(text) + 1 AS INT), 1)) AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB list_* higher-order spellings → Spark transform/aggregate
    "q_ann_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, array_max(transform(v, x -> abs(x)))
        |        AS mx FROM e),
        |c AS (SELECT vec_id,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |q AS (SELECT vec_id AS query_id, c AS qc FROM c
        |      WHERE vec_id < 10),
        |scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
        |    aggregate(zip_with(qc, b.c, (x, y) -> x * y),
        |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS idot
        |  FROM q JOIN c b ON b.vec_id != q.query_id),
        |ranked AS (SELECT query_id, neighbor_id, idot,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY idot DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, rnk, idot
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    "q_ann_ivfpq" -> {
      import graft.similarity.Similarity.{PqAnchorBounds, PqSubDim,
        PqSubspaces}
      s"""WITH $sparkIvfRankedCte,
         |im AS (SELECT vec_id, v, array_max(transform(v, x -> abs(x)))
         |         AS mx FROM e),
         |ic AS (SELECT vec_id,
         |         transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |           AS c
         |       FROM im),
         |cent AS (SELECT vec_id - ${PqAnchorBounds._1} AS j, c AS cc
         |         FROM ic WHERE vec_id >= ${PqAnchorBounds._1}
         |           AND vec_id < ${PqAnchorBounds._2}),
         |sd AS (SELECT ic.vec_id, s.m, ct.j,
         |         aggregate(transform(sequence(1, $PqSubDim), i ->
         |           (element_at(ic.c, s.m * $PqSubDim + i)
         |              - element_at(ct.cc, s.m * $PqSubDim + i))
         |           * (element_at(ic.c, s.m * $PqSubDim + i)
         |              - element_at(ct.cc, s.m * $PqSubDim + i))),
         |           CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist
         |       FROM ic
         |       CROSS JOIN (SELECT explode(sequence(0, ${PqSubspaces - 1}))
         |                     AS m) s
         |       CROSS JOIN cent ct),
         |enc AS (SELECT vec_id, m, j FROM (
         |        SELECT vec_id, m, j, ROW_NUMBER() OVER (
         |          PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM sd)
         |        WHERE rn = 1),
         |scored AS (
         |  SELECT p.query_id, c2.vec_id AS neighbor_id,
         |         CAST(SUM(qs.dist) AS BIGINT) AS adc
         |  FROM probes2 p
         |  JOIN cells2 c2 ON c2.cell = p.qcell AND c2.vec_id != p.query_id
         |  JOIN enc eb ON eb.vec_id = c2.vec_id
         |  JOIN sd qs ON qs.vec_id = p.query_id AND qs.m = eb.m
         |            AND qs.j = eb.j
         |  GROUP BY 1, 2),
         |rankedq AS (SELECT query_id, neighbor_id, adc,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY adc, neighbor_id) AS BIGINT) AS rnk FROM scored)
         |SELECT query_id, neighbor_id, rnk, adc
         |FROM rankedq WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },

    "q_ann_filtered" ->
      s"""WITH $sparkIvfRankedCte,
         |el AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v
         |       FROM embeddings),
         |im AS (SELECT vec_id, label, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM el),
         |ic AS (SELECT vec_id, label,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |cand AS (SELECT p.query_id, qi.c AS qc,
         |                b.vec_id AS neighbor_id, b.c AS bc
         |         FROM probes2 p
         |         JOIN ic qi ON qi.vec_id = p.query_id
         |         JOIN cells2 c2 ON c2.cell = p.qcell
         |                       AND c2.vec_id != p.query_id
         |         JOIN ic b ON b.vec_id = c2.vec_id
         |                  AND b.label = qi.label),
         |scored AS (SELECT query_id, neighbor_id,
         |    aggregate(zip_with(qc, bc, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS idot
         |  FROM cand),
         |rankedf AS (SELECT query_id, neighbor_id, idot,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY idot DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, rnk, idot
         |FROM rankedf WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // q_ann_filtered with the label predicate flipped to inequality and
    // the negative's label carried (hard-negative mining, r8)
    "q_hard_negatives" ->
      s"""WITH $sparkIvfRankedCte,
         |el AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v
         |       FROM embeddings),
         |im AS (SELECT vec_id, label, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM el),
         |ic AS (SELECT vec_id, label,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |cand AS (SELECT p.query_id, qi.c AS qc,
         |                b.vec_id AS neighbor_id, b.label AS neg_label,
         |                b.c AS bc
         |         FROM probes2 p
         |         JOIN ic qi ON qi.vec_id = p.query_id
         |         JOIN cells2 c2 ON c2.cell = p.qcell
         |                       AND c2.vec_id != p.query_id
         |         JOIN ic b ON b.vec_id = c2.vec_id
         |                  AND b.label != qi.label),
         |scored AS (SELECT query_id, neighbor_id, neg_label,
         |    aggregate(zip_with(qc, bc, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS idot
         |  FROM cand),
         |rankedh AS (SELECT query_id, neighbor_id, neg_label, idot,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY idot DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, CAST(neg_label AS INT) AS neg_label,
         |       rnk, idot
         |FROM rankedh WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    "q_source_overlap" ->
      s"""WITH $shingleCte,
         |ss AS (SELECT DISTINCT source, h FROM (
         |   SELECT d.source, explode(s.hs) AS h
         |   FROM sh s JOIN documents d ON d.doc_id = s.doc_id)),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ss
         |        GROUP BY 1),
         |pair AS (SELECT a.source AS src_a, b.source AS src_b,
         |           CAST(COUNT(*) AS BIGINT) AS shared
         |         FROM ss a JOIN ss b ON a.h = b.h AND a.source < b.source
         |         GROUP BY 1, 2)
         |SELECT p.src_a, p.src_b, p.shared, ca.n AS n_a, cb.n AS n_b,
         |  CAST(p.shared AS DOUBLE) / (ca.n + cb.n - p.shared) AS jaccard
         |FROM pair p
         |JOIN cnt ca ON ca.source = p.src_a
         |JOIN cnt cb ON cb.source = p.src_b
         |ORDER BY src_a, src_b""".stripMargin,

    "q_knn_classify" -> {
      import graft.similarity.Similarity.QuerySet
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>)
         |             AS v
         |           FROM embeddings),
         |im AS (SELECT vec_id, label, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM e),
         |ic AS (SELECT vec_id, label,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |q AS (SELECT vec_id AS query_id, label AS true_label, c AS qc
         |      FROM ic WHERE $QuerySet),
         |scored AS (SELECT q.query_id, q.true_label, b.label AS nlabel,
         |    b.vec_id AS neighbor_id,
         |    aggregate(zip_with(qc, b.c, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS idot
         |  FROM q JOIN ic b ON b.vec_id != q.query_id),
         |top5 AS (SELECT query_id, true_label, nlabel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY idot DESC, neighbor_id) AS rn FROM scored)
         |  WHERE rn <= 5),
         |votes AS (SELECT query_id, true_label, nlabel,
         |            CAST(COUNT(*) AS BIGINT) AS votes
         |          FROM top5 GROUP BY 1, 2, 3),
         |pred AS (SELECT query_id, true_label, nlabel AS pred_label, votes
         |         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |                 ORDER BY votes DESC, nlabel) AS rn FROM votes)
         |         WHERE rn = 1)
         |SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
         |       CAST(pred_label AS BIGINT) AS pred_label, votes
         |FROM pred ORDER BY query_id""".stripMargin
    },

    "q_mmr_rerank" -> {
      import graft.similarity.Similarity.{MmrPool, QuerySet}
      val idot = "aggregate(zip_with(%s, %s, (x, y) -> x * y), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
         |           FROM embeddings),
         |im AS (SELECT vec_id, v, array_max(transform(v, x -> abs(x)))
         |         AS mx FROM e),
         |ic AS (SELECT vec_id,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |q AS (SELECT vec_id AS query_id, c AS qc FROM ic WHERE $QuerySet),
         |relx AS (SELECT q.query_id, b.vec_id AS cand_id,
         |    ${idot.format("qc", "b.c")} AS rel
         |  FROM q JOIN ic b ON b.vec_id != q.query_id),
         |cands AS (SELECT query_id, cand_id, rel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, cand_id) AS rn FROM relx)
         |  WHERE rn <= $MmrPool),
         |sims AS (
         |  SELECT x.query_id, x.cand_id AS a, y.cand_id AS b,
         |    ${idot.format("cx.c", "cy.c")} AS sim
         |  FROM cands x
         |  JOIN cands y ON y.query_id = x.query_id
         |              AND y.cand_id != x.cand_id
         |  JOIN ic cx ON cx.vec_id = x.cand_id
         |  JOIN ic cy ON cy.vec_id = y.cand_id),
         |s1 AS (SELECT query_id, cand_id, 7 * rel AS score FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, cand_id) AS rn FROM cands) WHERE rn = 1),
         |r2 AS (SELECT c.query_id, c.cand_id,
         |         7 * c.rel - 3 * s.sim AS score
         |       FROM cands c
         |       JOIN s1 ON s1.query_id = c.query_id
         |              AND c.cand_id != s1.cand_id
         |       JOIN sims s ON s.query_id = c.query_id AND s.a = c.cand_id
         |                  AND s.b = s1.cand_id),
         |s2 AS (SELECT query_id, cand_id, score FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, cand_id) AS rn FROM r2) WHERE rn = 1),
         |r3 AS (SELECT c.query_id, c.cand_id,
         |         7 * c.rel - 3 * GREATEST(sa.sim, sb.sim) AS score
         |       FROM cands c
         |       JOIN s1 ON s1.query_id = c.query_id
         |       JOIN s2 ON s2.query_id = c.query_id
         |       JOIN sims sa ON sa.query_id = c.query_id
         |                   AND sa.a = c.cand_id AND sa.b = s1.cand_id
         |       JOIN sims sb ON sb.query_id = c.query_id
         |                   AND sb.a = c.cand_id AND sb.b = s2.cand_id
         |       WHERE c.cand_id != s1.cand_id AND c.cand_id != s2.cand_id),
         |s3 AS (SELECT query_id, cand_id, score FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, cand_id) AS rn FROM r3) WHERE rn = 1)
         |SELECT query_id, pick, vec_id, CAST(score AS BIGINT) AS mmr_x10
         |FROM (
         |  SELECT query_id, 1 AS pick, cand_id AS vec_id, score FROM s1
         |  UNION ALL
         |  SELECT query_id, 2, cand_id, score FROM s2
         |  UNION ALL
         |  SELECT query_id, 3, cand_id, score FROM s3)
         |ORDER BY query_id, pick""".stripMargin
    },

    "q_label_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |             CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, label, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id, label,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, label, pos + 1 AS pos, val
        |      FROM (SELECT vec_id, label,
        |              posexplode(c) AS (pos, val) FROM c)),
        |cent AS (SELECT label, pos, CAST(SUM(val) AS BIGINT) AS s
        |         FROM x GROUP BY 1, 2),
        |cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM c
        |        GROUP BY 1),
        |d AS (SELECT x.vec_id, x.label,
        |        CAST(SUM((cnt.n * x.val - cent.s)
        |                 * (cnt.n * x.val - cent.s)) AS BIGINT) AS d2
        |      FROM x JOIN cent ON cent.label = x.label
        |        AND cent.pos = x.pos
        |      JOIN cnt ON cnt.label = x.label
        |      GROUP BY 1, 2),
        |r AS (SELECT label, vec_id, d2,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY label
        |          ORDER BY d2 DESC, vec_id) AS BIGINT) AS rnk
        |      FROM d)
        |SELECT CAST(label AS BIGINT) AS label, vec_id, rnk, d2
        |FROM r WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin,

    // The DataFrame program drives Lloyd rounds with driver-collected
    // literal centroids; the twin unrolls the same 3 rounds relationally
    // (exploded (vec, dim) join per assignment — identical integers)
    "q_kmeans" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |$lloydTwinCte
        |SELECT CAST(cl AS BIGINT) AS cluster,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(d2) AS BIGINT) AS inertia,
        |       CAST(MIN(vec_id) AS BIGINT) AS min_vec
        |FROM s3 GROUP BY cl ORDER BY cluster""".stripMargin,

    // Same 3 unrolled Lloyd rounds as the q_kmeans twin, then the
    // trained-cell probe + in-cell integer-dot scoring (the engine's
    // graft_dot_long kernel is SQL-callable, so the twin shares it)
    "q_ann_ivf_kmeans" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, pos, val
        |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
        |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM x
        |          WHERE vec_id < 8),
        |d1 AS (SELECT x.vec_id, cent0.cl,
        |         SUM((x.val - cent0.m) * (x.val - cent0.m)) AS d2
        |       FROM x JOIN cent0 ON cent0.pos = x.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d1),
        |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
        |cent1 AS (SELECT s1.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s1 ON s1.vec_id = x.vec_id GROUP BY 1, 2),
        |d2r AS (SELECT x.vec_id, cent1.cl,
        |          SUM((x.val - cent1.m) * (x.val - cent1.m)) AS d2
        |        FROM x JOIN cent1 ON cent1.pos = x.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d2r),
        |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
        |cent2 AS (SELECT s2.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s2 ON s2.vec_id = x.vec_id GROUP BY 1, 2),
        |d3 AS (SELECT x.vec_id, cent2.cl,
        |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
        |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cl, d2,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d3),
        |cells AS (SELECT a3.vec_id, a3.cl, c.c FROM a3
        |          JOIN c ON c.vec_id = a3.vec_id WHERE a3.rn = 1),
        |probes AS (SELECT a3.vec_id AS query_id, c.c AS qc, a3.cl
        |           FROM a3 JOIN c ON c.vec_id = a3.vec_id
        |           WHERE a3.rn <= ${graft.similarity.Similarity.IvfProbe}
        |             AND a3.${graft.similarity.Similarity.QuerySet}),
        |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
        |    CAST(graft_dot_long(p.qc, b.c) AS BIGINT) AS idot
        |  FROM probes p JOIN cells b ON b.cl = p.cl
        |                AND b.vec_id != p.query_id),
        |ranked AS (SELECT query_id, neighbor_id, idot,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY idot DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, rnk, idot
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // Same 3 unrolled Lloyd rounds, then the retrained-quantizer
    // float-cosine serve (q_ann_ivf's tail over trained cells)
    "q_ann_ivf_retrain" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |nn AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e),
        |m AS (SELECT vec_id, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, pos, val
        |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
        |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM x
        |          WHERE vec_id < 8),
        |d1 AS (SELECT x.vec_id, cent0.cl,
        |         SUM((x.val - cent0.m) * (x.val - cent0.m)) AS d2
        |       FROM x JOIN cent0 ON cent0.pos = x.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d1),
        |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
        |cent1 AS (SELECT s1.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s1 ON s1.vec_id = x.vec_id GROUP BY 1, 2),
        |d2r AS (SELECT x.vec_id, cent1.cl,
        |          SUM((x.val - cent1.m) * (x.val - cent1.m)) AS d2
        |        FROM x JOIN cent1 ON cent1.pos = x.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d2r),
        |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
        |cent2 AS (SELECT s2.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s2 ON s2.vec_id = x.vec_id GROUP BY 1, 2),
        |d3 AS (SELECT x.vec_id, cent2.cl,
        |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
        |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cl, d2,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d3),
        |cells AS (SELECT a3.vec_id, a3.cl, nn.v, nn.nrm FROM a3
        |          JOIN nn ON nn.vec_id = a3.vec_id WHERE a3.rn = 1),
        |probes AS (SELECT vec_id AS query_id, cl FROM a3
        |           WHERE rn <= ${graft.similarity.Similarity.IvfProbe}
        |             AND ${graft.similarity.Similarity.QuerySet}),
        |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
        |    graft_dot(q.v, b.v) / (q.nrm * b.nrm) AS cos
        |  FROM probes p
        |  JOIN nn q ON q.vec_id = p.query_id
        |  JOIN cells b ON b.cl = p.cl AND b.vec_id != p.query_id),
        |ranked2 AS (SELECT query_id, neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos_sim
        |FROM ranked2 WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // The retrain twin with the Lloyd rounds trained on the PREFIX
    // (batch 3 excluded) and the final assignment over everything,
    // mirroring q_ann_lifecycle's fold -> retrain -> fold chain
    "q_ann_lifecycle" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |nn AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e),
        |m AS (SELECT vec_id, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, pos, val
        |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
        |xt AS (SELECT vec_id, pos, val FROM x
        |       WHERE NOT (${graft.similarity.Similarity.ivfBatchSql(3)})),
        |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM xt
        |          WHERE vec_id < 8),
        |d1 AS (SELECT xt.vec_id, cent0.cl,
        |         SUM((xt.val - cent0.m) * (xt.val - cent0.m)) AS d2
        |       FROM xt JOIN cent0 ON cent0.pos = xt.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d1),
        |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
        |cent1 AS (SELECT s1.cl, xt.pos,
        |            CAST(floor(CAST(SUM(xt.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM xt JOIN s1 ON s1.vec_id = xt.vec_id GROUP BY 1, 2),
        |d2r AS (SELECT xt.vec_id, cent1.cl,
        |          SUM((xt.val - cent1.m) * (xt.val - cent1.m)) AS d2
        |        FROM xt JOIN cent1 ON cent1.pos = xt.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d2r),
        |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
        |cent2 AS (SELECT s2.cl, xt.pos,
        |            CAST(floor(CAST(SUM(xt.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM xt JOIN s2 ON s2.vec_id = xt.vec_id GROUP BY 1, 2),
        |d3 AS (SELECT x.vec_id, cent2.cl,
        |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
        |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cl, d2,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d3),
        |cells AS (SELECT a3.vec_id, a3.cl, nn.v, nn.nrm FROM a3
        |          JOIN nn ON nn.vec_id = a3.vec_id WHERE a3.rn = 1),
        |probes AS (SELECT vec_id AS query_id, cl FROM a3
        |           WHERE rn <= ${graft.similarity.Similarity.IvfProbe}
        |             AND ${graft.similarity.Similarity.QuerySet}),
        |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
        |    graft_dot(q.v, b.v) / (q.nrm * b.nrm) AS cos
        |  FROM probes p
        |  JOIN nn q ON q.vec_id = p.query_id
        |  JOIN cells b ON b.cl = p.cl AND b.vec_id != p.query_id),
        |ranked2 AS (SELECT query_id, neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos_sim,
        |       (${graft.similarity.Similarity.ivfBatchSql(3)
          .replace("vec_id", "neighbor_id")}) AS is_new
        |FROM ranked2 WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // Same 3 unrolled Lloyd rounds as the q_kmeans twin, plus the
    // (cluster, label) purity tail
    "q_cluster_purity" ->
      """WITH e AS (SELECT vec_id, label,
        |             CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, label, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id, label,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, pos, val
        |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
        |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM x
        |          WHERE vec_id < 8),
        |d1 AS (SELECT x.vec_id, cent0.cl,
        |         SUM((x.val - cent0.m) * (x.val - cent0.m)) AS d2
        |       FROM x JOIN cent0 ON cent0.pos = x.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d1),
        |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
        |cent1 AS (SELECT s1.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s1 ON s1.vec_id = x.vec_id GROUP BY 1, 2),
        |d2r AS (SELECT x.vec_id, cent1.cl,
        |          SUM((x.val - cent1.m) * (x.val - cent1.m)) AS d2
        |        FROM x JOIN cent1 ON cent1.pos = x.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d2r),
        |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
        |cent2 AS (SELECT s2.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s2 ON s2.vec_id = x.vec_id GROUP BY 1, 2),
        |d3 AS (SELECT x.vec_id, cent2.cl,
        |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
        |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d3),
        |s3 AS (SELECT a3.vec_id, a3.cl, c.label FROM a3
        |       JOIN c ON c.vec_id = a3.vec_id WHERE a3.rn = 1),
        |lab AS (SELECT cl, label, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM s3 GROUP BY 1, 2),
        |mj AS (SELECT cl, label, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY cl
        |           ORDER BY cnt DESC, label) AS r,
        |         SUM(cnt) OVER (PARTITION BY cl) AS n
        |       FROM lab)
        |SELECT CAST(cl AS BIGINT) AS cluster, CAST(n AS BIGINT) AS n,
        |       CAST(label AS BIGINT) AS maj_label, cnt AS n_maj,
        |       CAST((cnt * 1000) div n AS BIGINT) AS purity_pm
        |FROM mj WHERE r = 1 ORDER BY cluster""".stripMargin,

    // posexploded spelling of the PQ per-subspace error: codeword and
    // vector dims meet on pos, subspace = pos div PqSubDim
    "q_pq_distortion" -> {
      val (lo, hi) = graft.similarity.Similarity.PqAnchorBounds
      val sub = graft.similarity.Similarity.PqSubDim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
         |           FROM embeddings),
         |im AS (SELECT vec_id, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM e),
         |ic AS (SELECT vec_id,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |x AS (SELECT vec_id, pos, val
         |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM ic)),
         |centx AS (SELECT vec_id - $lo AS j, pos, val AS cv FROM x
         |          WHERE vec_id >= $lo AND vec_id < $hi),
         |sd AS (SELECT x.vec_id, x.pos div $sub AS m, cx.j,
         |         SUM((x.val - cx.cv) * (x.val - cx.cv)) AS dist
         |       FROM x JOIN centx cx ON cx.pos = x.pos GROUP BY 1, 2, 3),
         |best AS (SELECT vec_id, m, MIN(dist) AS qerr FROM sd
         |         GROUP BY 1, 2)
         |SELECT CAST(m AS BIGINT) AS subspace, COUNT(*) AS n,
         |  CAST(SUM(qerr) AS BIGINT) AS sum_err,
         |  CAST(MAX(qerr) AS BIGINT) AS max_err,
         |  CAST(COUNT(*) FILTER (WHERE qerr = 0) AS BIGINT) AS zero_n
         |FROM best GROUP BY m ORDER BY subspace""".stripMargin
    },

    // the q_pq_train posexploded Lloyd chain feeding the q_ann_ivfpq
    // ADC join: train cent2, encode via (m, j) argmin, score by joining
    // query distances on the neighbor's assigned (m, j)
    "q_ann_ivfpq_trained" -> {
      val (lo, hi) = graft.similarity.Similarity.PqAnchorBounds
      val sub = graft.similarity.Similarity.PqSubDim
      s"""WITH $sparkIvfRankedCte,
         |im AS (SELECT vec_id, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM e),
         |ic AS (SELECT vec_id,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |x AS (SELECT vec_id, pos div $sub AS m, pos % $sub AS i, val
         |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM ic)),
         |cent0 AS (SELECT vec_id - $lo AS j, m, i, val AS cv FROM x
         |          WHERE vec_id >= $lo AND vec_id < $hi),
         |d1t AS (SELECT x.vec_id, x.m, c0.j,
         |         SUM((x.val - c0.cv) * (x.val - c0.cv)) AS dist
         |       FROM x JOIN cent0 c0 ON c0.m = x.m AND c0.i = x.i
         |       GROUP BY 1, 2, 3),
         |s1t AS (SELECT vec_id, m, j FROM (SELECT *, ROW_NUMBER() OVER (
         |         PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d1t)
         |        WHERE rn = 1),
         |cent1 AS (SELECT s1t.m, s1t.j, x.i,
         |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
         |                 AS BIGINT) AS cv
         |          FROM x JOIN s1t ON s1t.vec_id = x.vec_id
         |                         AND s1t.m = x.m
         |          GROUP BY 1, 2, 3),
         |d2t AS (SELECT x.vec_id, x.m, c1.j,
         |         SUM((x.val - c1.cv) * (x.val - c1.cv)) AS dist
         |       FROM x JOIN cent1 c1 ON c1.m = x.m AND c1.i = x.i
         |       GROUP BY 1, 2, 3),
         |s2t AS (SELECT vec_id, m, j FROM (SELECT *, ROW_NUMBER() OVER (
         |         PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d2t)
         |        WHERE rn = 1),
         |cent2 AS (SELECT s2t.m, s2t.j, x.i,
         |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
         |                 AS BIGINT) AS cv
         |          FROM x JOIN s2t ON s2t.vec_id = x.vec_id
         |                         AND s2t.m = x.m
         |          GROUP BY 1, 2, 3),
         |d3t AS (SELECT x.vec_id, x.m, c2.j,
         |         SUM((x.val - c2.cv) * (x.val - c2.cv)) AS dist
         |       FROM x JOIN cent2 c2 ON c2.m = x.m AND c2.i = x.i
         |       GROUP BY 1, 2, 3),
         |enc AS (SELECT vec_id, m, j FROM (SELECT *, ROW_NUMBER() OVER (
         |         PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d3t)
         |        WHERE rn = 1),
         |scored AS (
         |  SELECT p.query_id, cl.vec_id AS neighbor_id,
         |         CAST(SUM(qs.dist) AS BIGINT) AS adc
         |  FROM probes2 p
         |  JOIN cells2 cl ON cl.cell = p.qcell AND cl.vec_id != p.query_id
         |  JOIN enc eb ON eb.vec_id = cl.vec_id
         |  JOIN d3t qs ON qs.vec_id = p.query_id AND qs.m = eb.m
         |             AND qs.j = eb.j
         |  GROUP BY 1, 2),
         |rankedq AS (SELECT query_id, neighbor_id, adc,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY adc, neighbor_id) AS BIGINT) AS rnk FROM scored)
         |SELECT query_id, neighbor_id, rnk, adc
         |FROM rankedq WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },

    // per-subspace Lloyd over posexploded sub-vectors: m = pos div
    // PqSubDim, i = pos % PqSubDim; codeword and vector dims meet on
    // (m, i), updates are floored means per (m, j, i)
    "q_pq_train" -> {
      val (lo, hi) = graft.similarity.Similarity.PqAnchorBounds
      val sub = graft.similarity.Similarity.PqSubDim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
         |           FROM embeddings),
         |im AS (SELECT vec_id, v,
         |         array_max(transform(v, x -> abs(x))) AS mx FROM e),
         |ic AS (SELECT vec_id,
         |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
         |          AS c
         |      FROM im),
         |x AS (SELECT vec_id, pos div $sub AS m, pos % $sub AS i, val
         |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM ic)),
         |cent0 AS (SELECT vec_id - $lo AS j, m, i, val AS cv FROM x
         |          WHERE vec_id >= $lo AND vec_id < $hi),
         |d1 AS (SELECT x.vec_id, x.m, c0.j,
         |         SUM((x.val - c0.cv) * (x.val - c0.cv)) AS dist
         |       FROM x JOIN cent0 c0 ON c0.m = x.m AND c0.i = x.i
         |       GROUP BY 1, 2, 3),
         |a1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |         ORDER BY dist, j) AS rn FROM d1),
         |s1 AS (SELECT vec_id, m, j, dist FROM a1 WHERE rn = 1),
         |cent1 AS (SELECT s1.m, s1.j, x.i,
         |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
         |                 AS BIGINT) AS cv
         |          FROM x JOIN s1 ON s1.vec_id = x.vec_id AND s1.m = x.m
         |          GROUP BY 1, 2, 3),
         |d2 AS (SELECT x.vec_id, x.m, c1.j,
         |         SUM((x.val - c1.cv) * (x.val - c1.cv)) AS dist
         |       FROM x JOIN cent1 c1 ON c1.m = x.m AND c1.i = x.i
         |       GROUP BY 1, 2, 3),
         |a2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |         ORDER BY dist, j) AS rn FROM d2),
         |s2 AS (SELECT vec_id, m, j FROM a2 WHERE rn = 1),
         |cent2 AS (SELECT s2.m, s2.j, x.i,
         |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
         |                 AS BIGINT) AS cv
         |          FROM x JOIN s2 ON s2.vec_id = x.vec_id AND s2.m = x.m
         |          GROUP BY 1, 2, 3),
         |d3 AS (SELECT x.vec_id, x.m, c2.j,
         |         SUM((x.val - c2.cv) * (x.val - c2.cv)) AS dist
         |       FROM x JOIN cent2 c2 ON c2.m = x.m AND c2.i = x.i
         |       GROUP BY 1, 2, 3),
         |a3 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |         ORDER BY dist, j) AS rn FROM d3),
         |s3 AS (SELECT vec_id, m, dist FROM a3 WHERE rn = 1),
         |k2 AS (SELECT m, CAST(COUNT(DISTINCT j) AS BIGINT) AS n_codewords
         |       FROM cent2 GROUP BY m)
         |SELECT CAST(s1.m AS BIGINT) AS subspace, COUNT(*) AS n,
         |  CAST(SUM(s1.dist) AS BIGINT) AS sum_err_anchor,
         |  CAST(SUM(s3.dist) AS BIGINT) AS sum_err_trained,
         |  MIN(k2.n_codewords) AS n_codewords
         |FROM s1 JOIN s3 ON s3.vec_id = s1.vec_id AND s3.m = s1.m
         |        JOIN k2 ON k2.m = s1.m
         |GROUP BY s1.m ORDER BY subspace""".stripMargin
    },

    // the q_kmeans posexploded Lloyd chain + the moment identity
    // Σ‖ci−cj‖² = n·‖ci‖² + ΣQ − 2·ci·S spelled as pos-joined aggregates
    "q_silhouette" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        array_max(transform(v, x -> abs(x))) AS mx FROM e),
        |c AS (SELECT vec_id,
        |        transform(v, x -> CAST(floor(x * 127 / mx) AS BIGINT))
        |          AS c
        |      FROM m),
        |x AS (SELECT vec_id, pos, val
        |      FROM (SELECT vec_id, posexplode(c) AS (pos, val) FROM c)),
        |cent0 AS (SELECT vec_id AS cl, pos, val AS m FROM x
        |          WHERE vec_id < 8),
        |d1 AS (SELECT x.vec_id, cent0.cl,
        |         SUM((x.val - cent0.m) * (x.val - cent0.m)) AS d2
        |       FROM x JOIN cent0 ON cent0.pos = x.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d1),
        |s1 AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
        |cent1 AS (SELECT s1.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s1 ON s1.vec_id = x.vec_id GROUP BY 1, 2),
        |d2r AS (SELECT x.vec_id, cent1.cl,
        |          SUM((x.val - cent1.m) * (x.val - cent1.m)) AS d2
        |        FROM x JOIN cent1 ON cent1.pos = x.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d2r),
        |s2 AS (SELECT vec_id, cl FROM a2 WHERE rn = 1),
        |cent2 AS (SELECT s2.cl, x.pos,
        |            CAST(floor(CAST(SUM(x.val) AS DOUBLE) / COUNT(*))
        |                 AS BIGINT) AS m
        |          FROM x JOIN s2 ON s2.vec_id = x.vec_id GROUP BY 1, 2),
        |d3 AS (SELECT x.vec_id, cent2.cl,
        |         SUM((x.val - cent2.m) * (x.val - cent2.m)) AS d2
        |       FROM x JOIN cent2 ON cent2.pos = x.pos GROUP BY 1, 2),
        |a3 AS (SELECT vec_id, cl,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl)
        |           AS rn
        |       FROM d3),
        |s3 AS (SELECT vec_id, cl FROM a3 WHERE rn = 1),
        |qv AS (SELECT vec_id, SUM(val * val) AS qi FROM x GROUP BY vec_id),
        |momn AS (SELECT s3.cl, CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(qv.qi) AS BIGINT) AS qq
        |         FROM s3 JOIN qv ON qv.vec_id = s3.vec_id GROUP BY s3.cl),
        |moms AS (SELECT s3.cl, x.pos, CAST(SUM(x.val) AS BIGINT) AS sv
        |         FROM x JOIN s3 ON s3.vec_id = x.vec_id GROUP BY 1, 2),
        |dots AS (SELECT x.vec_id, moms.cl AS ocl,
        |           SUM(x.val * moms.sv) AS dt
        |         FROM x JOIN moms ON moms.pos = x.pos GROUP BY 1, 2),
        |sumd AS (SELECT s3.vec_id, s3.cl, d.ocl, mn.n,
        |           CAST(mn.n * qv.qi + mn.qq - 2 * d.dt AS BIGINT) AS sd
        |         FROM s3 JOIN qv ON qv.vec_id = s3.vec_id
        |                 JOIN dots d ON d.vec_id = s3.vec_id
        |                 JOIN momn mn ON mn.cl = d.ocl),
        |ab AS (SELECT vec_id, cl,
        |         MAX(CASE WHEN ocl = cl AND n > 1
        |               THEN CAST(sd AS DOUBLE) / (n - 1) END) AS a,
        |         MIN(CASE WHEN ocl <> cl
        |               THEN CAST(sd AS DOUBLE) / n END) AS b
        |       FROM sumd GROUP BY vec_id, cl),
        |sil AS (SELECT vec_id, cl,
        |          CASE WHEN a IS NULL OR b IS NULL OR greatest(a, b) = 0
        |               THEN CAST(0 AS BIGINT)
        |               ELSE CAST(floor(1000 * (b - a) / greatest(a, b))
        |                    AS BIGINT) END AS s_mille
        |        FROM ab)
        |SELECT CAST(cl AS BIGINT) AS cluster, COUNT(*) AS n,
        |       CAST(SUM(s_mille) AS BIGINT) AS sum_s_mille,
        |       CAST(MIN(s_mille) AS BIGINT) AS min_s_mille,
        |       CAST(MAX(s_mille) AS BIGINT) AS max_s_mille
        |FROM sil GROUP BY cl ORDER BY cluster""".stripMargin,

    // DuckDB indexes the token list; the Spark spelling builds bigrams
    // with zip_with over shifted slices (the q_pmi_bigrams pattern)
    "q_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, split(text, ' ') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id, bgs.x AS x, bgs.y AS y
        |       FROM (SELECT doc_id, explode(zip_with(
        |               slice(toks, 1, size(toks) - 1),
        |               slice(toks, 2, size(toks) - 1),
        |               (a, b) -> named_struct('x', a, 'y', b))) AS bgs
        |             FROM t)),
        |bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg
        |       GROUP BY 1, 2),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bg),
        |sc AS (SELECT g.doc_id,
        |         CAST(SUM((nb.nb * 1000) div c.n_xy) AS BIGINT) AS s,
        |         CAST(COUNT(*) AS BIGINT) AS n_bg
        |       FROM bg g JOIN bc c ON c.x = g.x AND c.y = g.y
        |       CROSS JOIN nb
        |       GROUP BY 1)
        |SELECT doc_id, (s div n_bg) AS surprisal, n_bg
        |FROM sc ORDER BY surprisal DESC, doc_id LIMIT 20""".stripMargin,

    // Spark SQL has no ASOF JOIN — the twin is the union + key-window
    // carry-forward spelling (the same composition the DataFrame program
    // uses, proving the SQL surface can express the operator too)
    "q_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              unix_micros(ts) AS t FROM events),
        |c AS (SELECT user_id, t, MAX(event_id) AS click_id
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, t),
        |u AS (SELECT user_id, t, 0 AS side, click_id,
        |        CAST(NULL AS BIGINT) AS event_id FROM c
        |      UNION ALL
        |      SELECT user_id, t, 1, CAST(NULL AS BIGINT), event_id
        |      FROM ev WHERE event_type = 'purchase'),
        |f AS (SELECT *,
        |        last(CASE WHEN side = 0 THEN struct(t, click_id) END, true)
        |          OVER (PARTITION BY user_id ORDER BY t, side, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cf
        |      FROM u)
        |SELECT user_id, event_id AS purchase_id, t AS purchase_us,
        |       cf.click_id AS click_id, cf.t AS click_us,
        |       t - cf.t AS gap_us
        |FROM f WHERE side = 1 ORDER BY purchase_id""".stripMargin,

    "q_gif_frames" ->
      """WITH g AS (SELECT doc_id, text, length(text) AS n,
        |    CAST(2 + doc_id % 3 AS INT) AS nf,
        |    CAST(8 + doc_id % 8 AS INT) AS w,
        |    CAST(8 + doc_id % 4 AS INT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  w AS width, h AS height,
        |  CAST(aggregate(transform(sequence(0, nf * w * h - 1), j ->
        |    CAST(ascii(substring(text,
        |      ((j div (w * h)) * 37 + (j % (w * h))) % n + 1, 1))
        |      AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS px_sum,
        |  CAST(aggregate(transform(sequence(0, nf * w * h - 1), j ->
        |    CAST((j div (w * h) + 1) AS BIGINT)
        |      * CAST((j % (w * h)) + 1 AS BIGINT)
        |      * CAST(ascii(substring(text,
        |          ((j div (w * h)) * 37 + (j % (w * h))) % n + 1, 1))
        |          AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS checksum
        |FROM g ORDER BY doc_id""".stripMargin,

    // closed form of the uniform-frame MJPEG-AVI chain (frame f is the
    // constant text byte at (f*37)%n, so the position-weighted pixel sum
    // telescopes to (wh)(wh+1)/2 * sum_f (f+1)*v_f)
    "q_avi_frames" ->
      """WITH g AS (SELECT doc_id, text, length(text) AS n,
        |    CAST(2 + doc_id % 3 AS INT) AS nf,
        |    CAST(8 + doc_id % 8 AS INT) AS w,
        |    CAST(8 + doc_id % 4 AS INT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  w AS width, h AS height,
        |  CAST(CAST(w AS BIGINT) * h *
        |    aggregate(transform(sequence(0, nf - 1), f ->
        |      CAST(ascii(substring(text, (f * 37) % n + 1, 1)) AS BIGINT)),
        |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS px_sum,
        |  CAST((CAST(w AS BIGINT) * h * (CAST(w AS BIGINT) * h + 1) div 2) *
        |    aggregate(transform(sequence(0, nf - 1), f ->
        |      CAST(f + 1 AS BIGINT)
        |        * ascii(substring(text, (f * 37) % n + 1, 1))),
        |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT) AS checksum
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_image_dhash_pairs" ->
      s"""WITH $dhashSparkCtes,
         |cand AS (SELECT DISTINCT a.img_id AS ia, b.img_id AS ib
         |         FROM keys a JOIN keys b
         |           ON a.band = b.band AND a.key = b.key
         |          AND a.img_id < b.img_id),
         |ham AS (SELECT c.ia, c.ib,
         |         bit_count(x.k0 ^ y.k0) + bit_count(x.k1 ^ y.k1)
         |       + bit_count(x.k2 ^ y.k2) + bit_count(x.k3 ^ y.k3)
         |           AS hamming
         |        FROM cand c JOIN kk x ON x.img_id = c.ia
         |                    JOIN kk y ON y.img_id = c.ib)
         |SELECT CAST(ia div 2 AS BIGINT) AS doc_a,
         |       CAST(ia % 2 AS BIGINT) AS var_a,
         |       CAST(ib div 2 AS BIGINT) AS doc_b,
         |       CAST(ib % 2 AS BIGINT) AS var_b,
         |       CAST(hamming AS BIGINT) AS hamming
         |FROM ham WHERE hamming <= ${graft.multimodal.Multimodal.DhashHamming}
         |ORDER BY doc_a, var_a, doc_b, var_b""".stripMargin,

    // directional delta screen over the shared dHash derivation (r14)
    "q_image_dedup_delta" ->
      s"""WITH $dhashSparkCtes,
         |candd AS (SELECT DISTINCT a.img_id AS bi, b.img_id AS oi
         |          FROM keys a JOIN keys b
         |            ON a.band = b.band AND a.key = b.key
         |          WHERE a.img_id % 2 = 1 AND b.img_id % 2 = 0),
         |hamd AS (SELECT c.bi, c.oi,
         |          bit_count(x.k0 ^ y.k0) + bit_count(x.k1 ^ y.k1)
         |        + bit_count(x.k2 ^ y.k2) + bit_count(x.k3 ^ y.k3)
         |            AS hamming
         |         FROM candd c JOIN kk x ON x.img_id = c.bi
         |                      JOIN kk y ON y.img_id = c.oi),
         |h8 AS (SELECT * FROM hamd
         |       WHERE hamming <= ${graft.multimodal.Multimodal.DhashHamming}),
         |best AS (SELECT bi, MIN(hamming) AS best_hamming
         |         FROM h8 GROUP BY 1),
         |pick AS (SELECT h.bi, b.best_hamming, MIN(h.oi) AS best_base
         |         FROM h8 h JOIN best b
         |           ON b.bi = h.bi AND h.hamming = b.best_hamming
         |         GROUP BY 1, 2)
         |SELECT d.doc_id,
         |       CAST(p.best_base div 2 AS BIGINT) AS best_doc,
         |       CAST(p.best_hamming AS BIGINT) AS best_hamming,
         |       p.best_hamming IS NOT NULL AS is_dup
         |FROM documents d
         |LEFT JOIN pick p ON p.bi = d.doc_id * 2 + 1
         |WHERE d.doc_id % 10 = 4
         |ORDER BY d.doc_id""".stripMargin,

    // two-phase image index fold (r14): batch-2 eligibility = originals
    // plus batch 1's non-dup survivors
    "q_image_index_update" ->
      s"""WITH $dhashSparkCtes,
         |c1 AS (SELECT DISTINCT a.img_id AS bi, b.img_id AS oi
         |       FROM keys a JOIN keys b
         |         ON a.band = b.band AND a.key = b.key
         |       WHERE a.img_id % 2 = 1 AND (a.img_id div 2) % 20 = 4
         |         AND b.img_id % 2 = 0),
         |b1dups AS (SELECT DISTINCT c.bi
         |           FROM c1 c JOIN kk x ON x.img_id = c.bi
         |                     JOIN kk y ON y.img_id = c.oi
         |           WHERE bit_count(x.k0 ^ y.k0) + bit_count(x.k1 ^ y.k1)
         |               + bit_count(x.k2 ^ y.k2) + bit_count(x.k3 ^ y.k3)
         |               <= ${graft.multimodal.Multimodal.DhashHamming}),
         |c2 AS (SELECT DISTINCT a.img_id AS bi, b.img_id AS oi
         |       FROM keys a JOIN keys b
         |         ON a.band = b.band AND a.key = b.key
         |       WHERE a.img_id % 2 = 1 AND (a.img_id div 2) % 20 = 14
         |         AND (b.img_id % 2 = 0
         |              OR (b.img_id % 2 = 1 AND (b.img_id div 2) % 20 = 4
         |                  AND b.img_id NOT IN (SELECT bi FROM b1dups)))),
         |ham2 AS (SELECT c.bi, c.oi,
         |          bit_count(x.k0 ^ y.k0) + bit_count(x.k1 ^ y.k1)
         |        + bit_count(x.k2 ^ y.k2) + bit_count(x.k3 ^ y.k3)
         |            AS hamming
         |         FROM c2 c JOIN kk x ON x.img_id = c.bi
         |                   JOIN kk y ON y.img_id = c.oi),
         |h82 AS (SELECT * FROM ham2
         |        WHERE hamming <= ${graft.multimodal.Multimodal.DhashHamming}),
         |best AS (SELECT bi, MIN(hamming) AS best_hamming
         |         FROM h82 GROUP BY 1),
         |pick AS (SELECT h.bi, b.best_hamming, MIN(h.oi) AS best_base
         |         FROM h82 h JOIN best b
         |           ON b.bi = h.bi AND h.hamming = b.best_hamming
         |         GROUP BY 1, 2)
         |SELECT d.doc_id,
         |       CAST(p.best_base div 2 AS BIGINT) AS best_doc,
         |       CAST(p.best_base % 2 AS BIGINT) AS best_var,
         |       CAST(p.best_hamming AS BIGINT) AS best_hamming,
         |       p.best_hamming IS NOT NULL AS is_dup,
         |       p.best_base % 2 = 1 AS from_batch1
         |FROM documents d
         |LEFT JOIN pick p ON p.bi = d.doc_id * 2 + 1
         |WHERE d.doc_id % 20 = 14
         |ORDER BY d.doc_id""".stripMargin,

    "q_media_resize" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 24 AS INT) AS in_w,
        |  CAST(8 + doc_id % 16 AS INT) AS in_h,
        |  CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
        |  CAST(aggregate(transform(sequence(0, 63), k ->
        |    (k + 1) * ascii(substring(text,
        |      CAST(1 + (((k div 8) * (8 + doc_id % 16) div 8)
        |                  * (8 + doc_id % 24)
        |                + ((k % 8) * (8 + doc_id % 24) div 8))
        |               % length(text) AS INT),
        |      1))), CAST(0 AS BIGINT), (acc, x) -> acc + x)
        |    AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      s"""WITH $shingleCte
         |SELECT d.doc_id, d.lang,
         |  CAST(greatest(size(split(d.text, ' ')) - 2, 0) AS BIGINT)
         |    AS n_grams,
         |  CAST(size(s.hs) AS BIGINT) AS n_unique,
         |  CASE WHEN size(split(d.text, ' ')) - 2 > 0
         |       THEN CAST(1.0 AS DOUBLE) - CAST(size(s.hs) AS DOUBLE)
         |            / (size(split(d.text, ' ')) - 2)
         |       ELSE CAST(0.0 AS DOUBLE) END AS dup_frac,
         |  CASE WHEN size(split(d.text, ' ')) - 2 > 0
         |       THEN (CAST(1.0 AS DOUBLE) - CAST(size(s.hs) AS DOUBLE)
         |            / (size(split(d.text, ' ')) - 2)) > 0.2
         |       ELSE FALSE END AS is_repetitive
         |FROM documents d JOIN sh s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_simhash_wide_docs" ->
      s"""WITH $shingleCte,
         |sh2 AS (SELECT doc_id, hs, $wideRehash AS hs2 FROM sh)
         |SELECT doc_id,
         |       CAST(${simhash62Sql("hs", "hs2")} AS BIGINT) AS simhash
         |FROM sh2 ORDER BY doc_id""".stripMargin,

    "q_simhash_wide_pairs" -> simhashWidePairsTwin,
    "q_bpe_train" -> bpeTrainTwin,
    "q_bpe_apply" -> bpeApplyTwin,

    // the twin goes through the SQL-registered bitmap aggregator (the
    // oracle is COUNT(DISTINCT) — proving accelerator == naive spelling)
    "q_bitmap_distinct" ->
      """SELECT l_returnflag,
        |       bitmap_distinct(l_partkey) AS n_parts,
        |       bitmap_distinct(l_suppkey) AS n_supps,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_corpus_clean" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, explode(hs) AS h FROM sh),
         |exn AS (SELECT e.doc_id, e.h, size(s.hs) AS n
         |        FROM ex e JOIN sh s ON s.doc_id = e.doc_id),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter,
         |         CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb
         |  FROM exn a JOIN exn b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5),
         |removed AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM p
         |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
         |quality AS (
         |  SELECT doc_id, $qualityCase AS quality FROM documents)
         |SELECT d.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(size(split(d.text, ' ')) AS BIGINT)) AS BIGINT)
         |    AS total_tokens
         |FROM documents d
         |JOIN quality q ON q.doc_id = d.doc_id
         |WHERE q.quality >= 0.75
         |  AND d.doc_id NOT IN (SELECT doc_id FROM removed)
         |GROUP BY 1 ORDER BY lang""".stripMargin,

    "q_multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  ascii(substring(text, 1, 1)) AS header_byte,
        |  CAST(aggregate(sequence(1, length(text)), CAST(0 AS BIGINT),
        |         (acc, i) -> acc + ascii(substring(text, i, 1))) % 997
        |       AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)

  private lazy val langIdTwin: String = {
    // same dictionaries as TextOps.qLangId (parity is spec-enforced)
    val dicts = Seq(
      "en" -> Seq("the", "a", "of", "is", "and"),
      "es" -> Seq("el", "la", "de", "es", "y"),
      "fr" -> Seq("le", "la", "de", "est", "et"),
      "de" -> Seq("der", "die", "das", "und", "ist"))
    val dictSql = dicts.map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("(", ", ", ")")
      s"CAST(size(filter(split(text, ' '), t -> t IN $lst)) AS BIGINT)" +
        s" AS s_$l"
    }.mkString(",\n    ")
    val cjk = "[一-鿿]"
    val langs = dicts.map(_._1) :+ "zh"
    val caseSql = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n    CASE ", "\n    ", "\n    ELSE 'zh' END")
    s"""WITH scores AS (
       |  SELECT doc_id, lang,
       |    $dictSql,
       |    CAST(size(regexp_extract_all(text, '$cjk', 0)) AS BIGINT) AS s_zh
       |  FROM documents)
       |SELECT doc_id, lang, s_en, s_es, s_fr, s_de, s_zh,
       |  $caseSql AS predicted
       |FROM scores ORDER BY doc_id""".stripMargin
  }

  /** The df pre-pass derivation report (q_jaccard_capstat's twin). */
  private lazy val capstatTwin: String =
    s"""WITH $shingleCte,
       |$dfCapTwinCtes
       |$capstatTwinSelect
       |FROM dcum c CROSS JOIN dnd nd
       |GROUP BY nd.n_docs""".stripMargin

  /** Exact pairs under the DERIVED cap (q_jaccard_pairs_autocap's twin):
    * the derivation runs as a scalar subquery, the verify is the same
    * array_intersect spelling as the fixed-cap twin. */
  private lazy val autocapTwin: String =
    s"""WITH $shingleCte,
       |$dfCapTwinCtes,
       |dcap AS (SELECT $derivedCapTwinSql AS c
       |       FROM dcum c CROSS JOIN dnd nd GROUP BY nd.n_docs),
       |kept AS (SELECT h FROM dfh WHERE df <= (SELECT c FROM dcap)),
       |exk AS (SELECT exd.doc_id, exd.h FROM exd
       |        JOIN kept ON kept.h = exd.h),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM exk a JOIN exk b ON a.h = b.h AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT)
       |         AS inter,
       |       CAST(size(sa.hs) + size(sb.hs)
       |            - size(array_intersect(sa.hs, sb.hs)) AS BIGINT) AS un,
       |       CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |         / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |            - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |         AS jaccard
       |FROM cand c
       |JOIN sh sa ON sa.doc_id = c.doc_a
       |JOIN sh sb ON sb.doc_id = c.doc_b
       |WHERE CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |        / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |           - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |      >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Incremental df-pre-pass maintenance (q_capstat_update's twin). */
  private lazy val capstatUpdateTwin: String =
    s"""WITH $shingleCte,
       |$dfCapTwinCtes,
       |bh AS (SELECT h, COUNT(*) AS df FROM exd
       |       WHERE doc_id % 10 = 0 GROUP BY 1),
       |oh AS (SELECT DISTINCT h FROM exd WHERE doc_id % 10 != 0),
       |ns AS (SELECT COUNT(*) AS new_shingles FROM bh
       |       WHERE h NOT IN (SELECT h FROM oh)),
       |bd AS (SELECT COUNT(*) AS batch_docs FROM documents
       |       WHERE doc_id % 10 = 0)
       |$capstatTwinSelect,
       |       CAST(bd.batch_docs AS BIGINT) AS batch_docs,
       |       CAST(ns.new_shingles AS BIGINT) AS new_shingles
       |FROM dcum c CROSS JOIN dnd nd CROSS JOIN bd CROSS JOIN ns
       |GROUP BY nd.n_docs, bd.batch_docs, ns.new_shingles""".stripMargin

  /** Bucket-occupancy retune-decision report (q_dedup_occupancy's twin):
    * the 4×4 standing and 2×8 target bandings from the same K = 16
    * signatures, then the histogram/p99/exp_cand arithmetic. */
  private lazy val dedupOccupancyTwin: String = {
    import TextHash.{Bands, K, R}
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    def bandSelects(bands: Int, r: Int): String = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(m${b * r + i} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    def schemeCtes(tag: String, src: String): String =
      s"""o$tag AS (SELECT band, key, COUNT(*) AS occ FROM $src GROUP BY 1, 2),
         |s$tag AS (SELECT band, COUNT(*) AS nb, SUM(occ) AS tot,
         |         MAX(occ) AS mx, SUM(occ * occ) AS ss
         |       FROM o$tag GROUP BY 1),
         |h$tag AS (SELECT band, occ, COUNT(*) AS cnt FROM o$tag GROUP BY 1, 2),
         |c$tag AS (SELECT band, occ,
         |         SUM(cnt) OVER (PARTITION BY band ORDER BY occ) AS cum
         |       FROM h$tag),
         |p$tag AS (SELECT c.band, MIN(c.occ) AS p99
         |       FROM c$tag c JOIN s$tag s ON s.band = c.band
         |       WHERE c.cum >= CEIL(s.nb * 0.99) GROUP BY 1)""".stripMargin
    def schemeRow(tag: String, scheme: String): String =
      s"""SELECT '$scheme' AS scheme, s.band, s.nb, s.tot, s.mx, p.p99,
         |       CAST(s.ss AS DOUBLE) / s.tot AS ec
         |FROM s$tag s JOIN p$tag p ON p.band = s.band""".stripMargin
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands4 AS (
       |  ${bandSelects(Bands, R)}),
       |bands2 AS (
       |  ${bandSelects(2, 8)}),
       |${schemeCtes("4", "bands4")},
       |${schemeCtes("2", "bands2")}
       |SELECT scheme, CAST(band AS BIGINT) AS band,
       |       CAST(nb AS BIGINT) AS n_buckets,
       |       CAST(tot AS BIGINT) AS total_rows,
       |       CAST(mx AS BIGINT) AS max_occ,
       |       CAST(p99 AS BIGINT) AS p99_occ,
       |       ec AS exp_cand,
       |       ec > ${graft.dedup.Dedup.OccBudget} AS retune
       |FROM (${schemeRow("4", "4x4")}
       |      UNION ALL ${schemeRow("2", "2x8")})
       |ORDER BY scheme, band""".stripMargin
  }

  /** IVF cell-balance retrain report (q_ann_cell_stats's twin): the
    * hash-anchor assignment in Spark SQL (graft_dot is the engine's own
    * SQL-callable kernel) next to the shared [[lloydTwinCte]] chain. */
  private lazy val cellStatsTwin: String = {
    val sim = graft.similarity.Similarity
    val lo = sim.IvfAnchorBase
    val hi = sim.IvfAnchorBase + sim.IvfCells
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
       |           FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e),
       |anch AS (SELECT vec_id AS anchor_id, v AS av, nrm AS anrm FROM n
       |         WHERE vec_id >= $lo AND vec_id < $hi),
       |assign AS (
       |  SELECT n.vec_id, a.anchor_id,
       |         graft_dot(n.v, a.av) / (n.nrm * a.anrm) AS acos
       |  FROM n CROSS JOIN anch a),
       |ranked AS (
       |  SELECT vec_id, anchor_id,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id
       |           ORDER BY acos DESC, anchor_id) AS arnk FROM assign),
       |$lloydTwinCte,
       |ac AS (SELECT anchor_id AS cell, COUNT(*) AS n FROM ranked
       |       WHERE arnk = 1 GROUP BY 1),
       |lc AS (SELECT cl AS cell, COUNT(*) AS n FROM s3 GROUP BY 1),
       |rep AS (
       |  SELECT 'anchor16' AS quantizer, COUNT(*) AS ncells,
       |         SUM(n) AS nv, MAX(n) AS mx, MIN(n) AS mn FROM ac
       |  UNION ALL
       |  SELECT 'lloyd8' AS quantizer, COUNT(*) AS ncells,
       |         SUM(n) AS nv, MAX(n) AS mx, MIN(n) AS mn FROM lc)
       |SELECT quantizer, CAST(ncells AS BIGINT) AS n_cells,
       |       CAST(nv AS BIGINT) AS n_vecs,
       |       CAST(mx AS BIGINT) AS max_cell,
       |       CAST(mn AS BIGINT) AS min_cell,
       |       CAST(nv AS DOUBLE) / ncells AS mean_cell,
       |       CAST(mx * ncells AS DOUBLE) / nv AS imbalance,
       |       CAST(mx * ncells AS DOUBLE) > ${sim.CellBalance} * nv
       |         AS retrain
       |FROM rep ORDER BY quantizer""".stripMargin
  }

  private lazy val minhashLshTwin: String = {
    import TextHash.{Bands, K, R}
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until R).map(r => s"CAST(m${b * R + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT) AS inter,
       |    CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |      - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT) AS un
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, inter, un,
       |       CAST(inter AS DOUBLE) / un AS jaccard
       |FROM verified
       |WHERE CAST(inter AS DOUBLE) / un >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** [[minhashLshTwin]]'s directional delta-ingest variant — batch bands
    * probe base bands (no self-join), mirroring q_dedup_delta. */
  private lazy val dedupDeltaTwin: String = {
    import TextHash.{Bands, K, R}
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until R).map(r => s"CAST(m${b * R + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands n JOIN bands o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 != 0),
       |hits AS (
       |  SELECT c.new_doc, c.base_doc,
       |    CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |      AS jaccard
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc),
       |hits8 AS (SELECT * FROM hits WHERE jaccard >= 0.8),
       |best AS (SELECT new_doc, MAX(jaccard) AS best_jaccard
       |         FROM hits8 GROUP BY new_doc),
       |pick AS (SELECT h.new_doc, b.best_jaccard,
       |                MIN(h.base_doc) AS best_base
       |         FROM hits8 h JOIN best b
       |           ON b.new_doc = h.new_doc
       |          AND h.jaccard = b.best_jaccard
       |         GROUP BY h.new_doc, b.best_jaccard)
       |SELECT d.doc_id, p.best_base, p.best_jaccard,
       |       p.best_jaccard IS NOT NULL AS is_dup
       |FROM documents d LEFT JOIN pick p ON p.new_doc = d.doc_id
       |WHERE d.doc_id % 10 = 0
       |ORDER BY doc_id""".stripMargin
  }

  /** [[dedupDeltaTwin]] at the RETUNED 2×8 banding over batch slice 7,
    * mirroring q_dedup_reband (same K = 16 signatures, re-projected
    * into 2 keys of 8). */
  private lazy val dedupRebandTwin: String = {
    import TextHash.K
    val (bands2, r2) = (2, 8)
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects = (0 until bands2).map { b =>
      val key = (0 until r2).map(i => s"CAST(m${b * r2 + i} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands n JOIN bands o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 != 7),
       |hits AS (
       |  SELECT c.new_doc, c.base_doc,
       |    CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |      AS jaccard
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc),
       |hits8 AS (SELECT * FROM hits WHERE jaccard >= 0.8),
       |best AS (SELECT new_doc, MAX(jaccard) AS best_jaccard
       |         FROM hits8 GROUP BY new_doc),
       |pick AS (SELECT h.new_doc, b.best_jaccard,
       |                MIN(h.base_doc) AS best_base
       |         FROM hits8 h JOIN best b
       |           ON b.new_doc = h.new_doc
       |          AND h.jaccard = b.best_jaccard
       |         GROUP BY h.new_doc, b.best_jaccard)
       |SELECT d.doc_id, p.best_base, p.best_jaccard,
       |       p.best_jaccard IS NOT NULL AS is_dup
       |FROM documents d LEFT JOIN pick p ON p.new_doc = d.doc_id
       |WHERE d.doc_id % 10 = 7
       |ORDER BY doc_id""".stripMargin
  }

  /** [[dedupDeltaTwin]]'s two-batch maintenance variant — batch-1
    * admission, survivor fold, batch-2 screen against the updated
    * index, mirroring q_dedup_index_update. */
  private lazy val dedupIndexUpdateTwin: String = {
    import TextHash.{Bands, K, R}
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until R).map(r => s"CAST(m${b * R + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands AS (
       |  $bandSelects),
       |c1 AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands n JOIN bands o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 NOT IN (0, 5)),
       |b1dups AS (
       |  SELECT DISTINCT c.new_doc
       |  FROM c1 c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc
       |  WHERE CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |      >= 0.8),
       |c2 AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands n JOIN bands o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 5
       |    AND (o.doc_id % 10 NOT IN (0, 5)
       |         OR (o.doc_id % 10 = 0
       |             AND o.doc_id NOT IN (SELECT new_doc FROM b1dups)))),
       |hits AS (
       |  SELECT c.new_doc, c.base_doc,
       |    CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
       |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
       |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))
       |      AS jaccard
       |  FROM c2 c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc),
       |hits8 AS (SELECT * FROM hits WHERE jaccard >= 0.8),
       |best AS (SELECT new_doc, MAX(jaccard) AS best_jaccard
       |         FROM hits8 GROUP BY new_doc),
       |pick AS (SELECT h.new_doc, b.best_jaccard,
       |                MIN(h.base_doc) AS best_base
       |         FROM hits8 h JOIN best b
       |           ON b.new_doc = h.new_doc
       |          AND h.jaccard = b.best_jaccard
       |         GROUP BY h.new_doc, b.best_jaccard)
       |SELECT d.doc_id, p.best_base, p.best_jaccard,
       |       p.best_jaccard IS NOT NULL AS is_dup,
       |       p.best_base % 10 = 0 AS from_batch1
       |FROM documents d LEFT JOIN pick p ON p.new_doc = d.doc_id
       |WHERE d.doc_id % 10 = 5
       |ORDER BY doc_id""".stripMargin
  }

  /** Fold → retune → fold on one chain, mirroring q_dedup_lifecycle:
    * phase A screens slice 2 against the base at the standing 4×4
    * banding; the retune re-projects the K = 16 signatures into 2 keys
    * of 8 over base + phase-A survivors; phase B screens slice 8
    * against the retuned index at 2×8. */
  private lazy val dedupLifecycleTwin: String = {
    import TextHash.{Bands, K, R}
    val (bands2, r2) = (2, 8)
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects4 = (0 until Bands).map { b =>
      val key = (0 until R).map(r => s"CAST(m${b * R + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    val bandSelects2 = (0 until bands2).map { b =>
      val key = (0 until r2).map(i => s"CAST(m${b * r2 + i} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    val jac =
      """CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
        |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
        |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))"""
        .stripMargin
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands4 AS (
       |  $bandSelects4),
       |bands2 AS (
       |  $bandSelects2),
       |cA AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands4 n JOIN bands4 o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 2 AND o.doc_id % 10 NOT IN (2, 8)),
       |aDups AS (
       |  SELECT DISTINCT c.new_doc
       |  FROM cA c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc
       |  WHERE $jac
       |      >= 0.8),
       |cB AS (
       |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
       |  FROM bands2 n JOIN bands2 o
       |    ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % 10 = 8
       |    AND (o.doc_id % 10 NOT IN (2, 8)
       |         OR (o.doc_id % 10 = 2
       |             AND o.doc_id NOT IN (SELECT new_doc FROM aDups)))),
       |hits AS (
       |  SELECT c.new_doc, c.base_doc,
       |    $jac
       |      AS jaccard
       |  FROM cB c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc),
       |hits8 AS (SELECT * FROM hits WHERE jaccard >= 0.8),
       |best AS (SELECT new_doc, MAX(jaccard) AS best_jaccard
       |         FROM hits8 GROUP BY new_doc),
       |pick AS (SELECT h.new_doc, b.best_jaccard,
       |                MIN(h.base_doc) AS best_base
       |         FROM hits8 h JOIN best b
       |           ON b.new_doc = h.new_doc
       |          AND h.jaccard = b.best_jaccard
       |         GROUP BY h.new_doc, b.best_jaccard)
       |SELECT d.doc_id, p.best_base, p.best_jaccard,
       |       p.best_jaccard IS NOT NULL AS is_dup,
       |       p.best_base % 10 = 2 AS from_batch_a
       |FROM documents d LEFT JOIN pick p ON p.new_doc = d.doc_id
       |WHERE d.doc_id % 10 = 8
       |ORDER BY doc_id""".stripMargin
  }

  /** [[dedupIndexUpdateTwin]]'s three-batch chain — phase-k candidates
    * are eligible against the base plus every earlier batch's
    * survivors, mirroring q_dedup_index_update3. */
  private lazy val dedupIndexUpdate3Twin: String = {
    import TextHash.{Bands, K, R}
    val sigCols = (0 until K)
      .map(k => s"${minhashSql("hs", k)} AS m$k").mkString(",\n       ")
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until R).map(r => s"CAST(m${b * R + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    val jac =
      """CAST(size(array_intersect(sa.hs, sb.hs)) AS DOUBLE)
        |      / (CAST(size(sa.hs) AS BIGINT) + CAST(size(sb.hs) AS BIGINT)
        |         - CAST(size(array_intersect(sa.hs, sb.hs)) AS BIGINT))"""
        .stripMargin
    def elig(earlier: Seq[(Int, String)]): String =
      (s"o.doc_id % 10 NOT IN (0, 5, 3)" +:
        earlier.map { case (m, dups) =>
          s"(o.doc_id % 10 = $m AND o.doc_id NOT IN " +
            s"(SELECT new_doc FROM $dups))"
        }).mkString("(", "\n         OR ", ")")
    def candCte(name: String, m: Int, earlier: Seq[(Int, String)]): String =
      s"""$name AS (
         |  SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS base_doc
         |  FROM bands n JOIN bands o
         |    ON n.band = o.band AND n.key = o.key
         |  WHERE n.doc_id % 10 = $m
         |    AND ${elig(earlier)})"""
    def dupsCte(name: String, cand: String): String =
      s"""$name AS (
         |  SELECT DISTINCT c.new_doc
         |  FROM $cand c
         |  JOIN sh sa ON sa.doc_id = c.new_doc
         |  JOIN sh sb ON sb.doc_id = c.base_doc
         |  WHERE $jac
         |      >= 0.8)"""
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, hs,
       |       $sigCols
       |FROM sh),
       |bands AS (
       |  $bandSelects),
       |${candCte("c1", 0, Seq.empty)},
       |${dupsCte("b1dups", "c1")},
       |${candCte("c2", 5, Seq(0 -> "b1dups"))},
       |${dupsCte("b2dups", "c2")},
       |${candCte("c3", 3, Seq(0 -> "b1dups", 5 -> "b2dups"))},
       |hits AS (
       |  SELECT c.new_doc, c.base_doc,
       |    $jac
       |      AS jaccard
       |  FROM c3 c
       |  JOIN sh sa ON sa.doc_id = c.new_doc
       |  JOIN sh sb ON sb.doc_id = c.base_doc),
       |hits8 AS (SELECT * FROM hits WHERE jaccard >= 0.8),
       |best AS (SELECT new_doc, MAX(jaccard) AS best_jaccard
       |         FROM hits8 GROUP BY new_doc),
       |pick AS (SELECT h.new_doc, b.best_jaccard,
       |                MIN(h.base_doc) AS best_base
       |         FROM hits8 h JOIN best b
       |           ON b.new_doc = h.new_doc
       |          AND h.jaccard = b.best_jaccard
       |         GROUP BY h.new_doc, b.best_jaccard)
       |SELECT d.doc_id, p.best_base, p.best_jaccard,
       |       p.best_jaccard IS NOT NULL AS is_dup,
       |       p.best_base % 10 = 0 AS from_b1,
       |       p.best_base % 10 = 5 AS from_b2
       |FROM documents d LEFT JOIN pick p ON p.new_doc = d.doc_id
       |WHERE d.doc_id % 10 = 3
       |ORDER BY doc_id""".stripMargin
  }

  private lazy val simhashPairsTwin: String = {
    val chunks = Seq((0, 6), (6, 6), (12, 6), (18, 6), (24, 4), (28, 4))
    val chunkSelects = chunks.zipWithIndex.map { case ((off, bits), i) =>
      s"SELECT doc_id, simhash, $i AS chunk, " +
        s"shiftright(simhash, $off) & ${(1 << bits) - 1} AS ckey FROM sims"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sims AS (
       |  SELECT doc_id, CAST(${simhashSql("hs")} AS BIGINT) AS simhash
       |  FROM sh),
       |chunks AS (
       |  $chunkSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
       |         b.doc_id AS doc_b, b.simhash AS sim_b
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |       CAST(bit_count(sim_a ^ sim_b) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(sim_a ^ sim_b) <= 5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Spark-dialect IVF fragment shared by the ANN twins: `ranked`
    * (corpus × anchor cosines with per-vector anchor rank), `cells2`
    * (arnk = 1 assignment) and `probes2` (per-query probe cells) —
    * mirrors [[graft.similarity.Similarity]]'s ivfRankedCteSql. */
  private lazy val sparkIvfRankedCte: String = {
    import graft.similarity.Similarity.{AnchorRangeSql, IvfProbe, QuerySet}
    s"""e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
       |           FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e),
       |anch AS (SELECT vec_id AS anchor_id, v AS av, nrm AS anrm FROM n
       |         WHERE $AnchorRangeSql),
       |assign AS (SELECT n.vec_id, a.anchor_id,
       |             graft_dot(n.v, a.av) / (n.nrm * a.anrm) AS acos
       |           FROM n CROSS JOIN anch a),
       |ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY acos DESC, anchor_id) AS BIGINT) AS arnk
       |           FROM assign),
       |cells2 AS (SELECT vec_id, anchor_id AS cell FROM ranked
       |           WHERE arnk = 1),
       |probes2 AS (SELECT vec_id AS query_id, anchor_id AS qcell
       |            FROM ranked WHERE arnk <= $IvfProbe AND $QuerySet)"""
      .stripMargin
  }

  /** Spark-dialect unroll of the BPE CTE chain (the DataFrame program's
    * driver-side argmax collects become scalar subqueries); mirrors
    * TextOps.bpeCtes incl. the source/n0 carry. */
  private def bpeSparkCtes(rounds: Int, last: Boolean): String = {
    val parts = Seq.newBuilder[String]
    parts += ("d1 AS (SELECT source, " +
      "CAST(size(split(text, ' ')) AS BIGINT) AS n0, " +
      "' ' || text || ' ' AS t FROM documents)")
    for (r <- 1 to rounds) {
      parts += s"""p$r AS (
        |  SELECT p.lhs AS lhs, p.rhs AS rhs, COUNT(*) AS c
        |  FROM (SELECT explode(transform(sequence(0, size(w) - 2),
        |          i -> struct(w[i] AS lhs, w[i + 1] AS rhs))) AS p
        |        FROM (SELECT split(trim(t), ' ') AS w FROM d$r)
        |        WHERE size(w) > 1)
        |  GROUP BY 1, 2)""".stripMargin
      parts +=
        s"m$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1)"
      if (r < rounds || last)
        parts += s"""d${r + 1} AS (SELECT source, n0, replace(t,
          |   ' ' || (SELECT lhs FROM m$r) || ' ' || (SELECT rhs FROM m$r) || ' ',
          |   ' ' || (SELECT lhs FROM m$r) || '+' || (SELECT rhs FROM m$r) || ' ') AS t
          |  FROM d$r)""".stripMargin
    }
    parts.result().mkString(",\n")
  }

  private lazy val bpeTrainTwin: String = {
    val rounds = graft.text.TextOps.BpeRounds
    val sel = (1 to rounds).map(r =>
      s"SELECT $r AS merge_rank, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM m$r")
      .mkString(" UNION ALL ")
    "WITH " + bpeSparkCtes(rounds, last = false) +
      s"\nSELECT * FROM ($sel) ORDER BY merge_rank"
  }

  private lazy val bpeApplyTwin: String = {
    val rounds = graft.text.TextOps.BpeRounds
    "WITH " + bpeSparkCtes(rounds, last = true) + s""",
      |fin AS (SELECT source, n0,
      |          CAST(size(split(trim(t), ' ')) AS BIGINT) AS n1
      |        FROM d${rounds + 1})
      |SELECT source, CAST(SUM(n0) AS BIGINT) AS tokens_ws,
      |  CAST(SUM(n1) AS BIGINT) AS tokens_bpe,
      |  CAST(SUM(n0) - SUM(n1) AS BIGINT) AS merged_occurrences,
      |  CAST(SUM(n1) AS DOUBLE) / SUM(n0) AS compression
      |FROM fin GROUP BY source ORDER BY source""".stripMargin
  }

  private lazy val simhashWidePairsTwin: String = {
    val chunkSelects = graft.dedup.Dedup.wideChunks.zipWithIndex.map {
      case ((off, bits), i) =>
        s"SELECT doc_id, simhash, $i AS chunk, " +
          s"shiftright(simhash, $off) & ${(1L << bits) - 1} AS ckey FROM sims"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sh2 AS (SELECT doc_id, hs, $wideRehash AS hs2 FROM sh),
       |sims AS (
       |  SELECT doc_id,
       |         CAST(${simhash62Sql("hs", "hs2")} AS BIGINT) AS simhash
       |  FROM sh2),
       |chunks AS (
       |  $chunkSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
       |         b.doc_id AS doc_b, b.simhash AS sim_b
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |       CAST(bit_count(sim_a ^ sim_b) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(sim_a ^ sim_b) <= 5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** [[graft.similarity.Similarity.qAnnRecall]]'s twin, composed from
    * the per-tier TWINS exactly as its oracle is composed from the
    * tier oracles — some tiers have hand-written override twins (their
    * oracles aren't mechanically dialect-convertible), so the recall
    * twin must reuse the twins, not `dialect(oracle)`. Lazy: it calls
    * [[twin]], which reads [[overrides]], so it cannot run during map
    * construction. */
  private lazy val annRecallTwin: String = {
    val tiers = Seq("ivf" -> "q_ann_ivf", "ivf_kmeans" -> "q_ann_ivf_kmeans",
      "ivfpq" -> "q_ann_ivfpq", "ivfpq_trained" -> "q_ann_ivfpq_trained",
      "int8" -> "q_ann_int8", "lsh" -> "q_ann_lsh",
      "multiprobe" -> "q_ann_multiprobe")
    val tierSql = (tiers.map { case (t, qn) =>
      s"""SELECT '$t' AS tier, query_id, neighbor_id
         |FROM (${twin(qn).get}) WHERE rnk <= 3""".stripMargin
    } :+ s"""SELECT 'filtered' AS tier, query_id, neighbor_id
            |FROM (${twin("q_ann_filtered").get}) WHERE rnk <= 3"""
      .stripMargin
      :+ s"""SELECT 'hard_neg' AS tier, query_id, neighbor_id
            |FROM (${twin("q_hard_negatives").get}) WHERE rnk <= 3"""
      .stripMargin).mkString("\n  UNION ALL\n")
    val exSql = (tiers.map { case (t, _) =>
      s"SELECT '$t' AS tier, query_id, neighbor_id FROM exu"
    } :+ "SELECT 'filtered' AS tier, query_id, neighbor_id FROM exf"
      :+ "SELECT 'hard_neg' AS tier, query_id, neighbor_id FROM exh")
      .mkString("\n  UNION ALL\n")
    s"""WITH exu AS (SELECT query_id, neighbor_id
       |            FROM (${twin("q_cosine_topk").get}) WHERE rnk <= 3),
       |exf AS (SELECT query_id, neighbor_id
       |        FROM (${dialect(graft.similarity.Similarity
                        .filteredExactSql)})),
       |exh AS (SELECT query_id, neighbor_id
       |        FROM (${dialect(graft.similarity.Similarity
                        .hardExactSql)})),
       |ex AS (
       |  $exSql),
       |t AS (
       |  $tierSql),
       |ek AS (SELECT tier, COUNT(*) AS exact_k FROM ex GROUP BY tier)
       |SELECT t.tier, COUNT(*) AS returned,
       |  CAST(SUM(CASE WHEN ex.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |       AS BIGINT) AS hits,
       |  CAST(ek.exact_k AS BIGINT) AS exact_k
       |FROM t
       |LEFT JOIN ex ON ex.tier = t.tier AND ex.query_id = t.query_id
       |            AND ex.neighbor_id = t.neighbor_id
       |JOIN ek ON ek.tier = t.tier
       |GROUP BY t.tier, ek.exact_k ORDER BY t.tier""".stripMargin
  }

  /** The Spark-SQL twin for a registered query, if one exists. */
  def twin(name: String): Option[String] =
    if (skips.contains(name)) None
    else if (name == "q_ann_recall") Some(annRecallTwin)
    else overrides.get(name)
      .orElse(graft.SparkEntry.oracleSql.get(name).map(dialect(_)))

  /** Run a query through its SQL twin (views + functions registered). */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(twin(name).getOrElse(
      sys.error(s"no SQL twin for $name: ${skips.getOrElse(name, "?")}")))
  }
}
