package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.io.Tables
import graft.queries.Q

/** Indexing / retrieval preparation over the document corpus: context-
  * window chunking, TF-IDF keyword extraction, term search, and PMI
  * collocation mining — the operators that turn a cleaned corpus into
  * retrieval units and index terms (RAG prep).
  *
  * Scale posture (100 TB): chunking is a pure per-row explode — no
  * shuffle at all. TF-IDF and search are two hash aggregates plus an
  * equi-join on the token key (df side is vocabulary-sized, far smaller
  * than the corpus); the per-document windows partition on doc_id, the
  * highest-cardinality key there is. Collocation mining prunes to
  * bigrams with support ≥ MinSupport BEFORE any join, so the joined
  * candidate set is collocation-sized, not corpus-sized; hot unigram
  * keys are bounded because the bigram side was already aggregated.
  * All scoring is exact: integer-scaled idf (micro-units, floor
  * division) and a single per-row double division for lift — both
  * bit-equal across engines (NOTES.md harness facts).
  */
object IndexOps {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Chunk size / stride (tokens). 32/24 → 8-token overlap between
    * consecutive chunks, the standard RAG window shape. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** Context-window chunking with overlap: one row per (doc, window
    * start), windows starting every [[ChunkStride]] tokens, each
    * [[ChunkSize]] tokens long (the tail windows shorter). The chunk
    * fingerprint is the engine hash of the re-joined token span, so a
    * off-by-one in any engine's slicing hash-mismatches. No shuffle:
    * explode + projection only. */
  val qChunkOverlap: Q = Q("q_chunk_overlap",
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |         unnest(range(0, (len(toks) - 1) // $ChunkStride + 1)) AS ci
       |  FROM t),
       |ch AS (
       |  SELECT doc_id, ci,
       |         toks[CAST(ci * $ChunkStride + 1 AS INT)
       |              : CAST(ci * $ChunkStride + $ChunkSize AS INT)] AS ck
       |  FROM c)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
       |  CAST(len(ck) AS BIGINT) AS n_tokens,
       |  ck[1] AS first_tok, ck[-1] AS last_tok,
       |  CAST(${TextHash.hash32Sql("array_to_string(ck, ' ')")} AS BIGINT)
       |    AS fp
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val ck = slice(col("toks"),
      (col("ci") * ChunkStride + 1).cast("int"), lit(ChunkSize))
    docs(s, d)
      .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"CAST((size(toks) - 1) div $ChunkStride AS BIGINT)")))
          .as("ci"))
      .select(col("doc_id"), col("ci").as("chunk_id"), ck.as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tokens"),
        element_at(col("ck"), 1).as("first_tok"),
        element_at(col("ck"), -1).as("last_tok"),
        TextHash.hash32(concat_ws(" ", col("ck"))).as("fp"))
      .orderBy("doc_id", "chunk_id")
  }

  /** idf in integer micro-units: floor(N·10⁶ / df) — exact in both
    * engines, no logarithm (ln implementations differ across engines;
    * any monotone transform of 1/df ranks identically). */
  private val IdfScale = 1000000L

  /** (doc_id, token, tf) term-frequency index, session-memoized (r9):
    * the tokenized postings a search stack persists rather than
    * re-derives per query. */
  private def termFreq(s: SparkSession, d: String): DataFrame =
    graft.plans.FrameMemo.memo(s, "termFreq", d) {
      docs(s, d)
        .select(col("doc_id"), explode(TextHash.tokens(col("text")))
          .as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"))
    }

  /** One-row document count, broadcast into the scoring join. */
  private def docCount(s: SparkSession, d: String): DataFrame =
    docs(s, d).agg(count(lit(1)).as("n_docs"))

  /** TF-IDF keyword extraction: top-3 index terms per document by
    * tf · floor(N·10⁶/df), ties by token. The window partitions on
    * doc_id (data-scaled cardinality — parallelism grows with the
    * corpus); df is a vocabulary-sized aggregate joined back on the
    * token key. */
  val qTfidfTerms: Q = Q("q_tfidf_terms",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |sc AS (
       |  SELECT t.doc_id, t.token, t.tf, d.df,
       |         t.tf * ((n.n_docs * $IdfScale) // d.df) AS score
       |  FROM tf t JOIN df d ON d.token = t.token CROSS JOIN n),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
       |  FROM sc)
       |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
       |  CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) {
    (s, d) =>
      val tf = termFreq(s, d)
      val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(df_, "token")
        .crossJoin(broadcast(docCount(s, d)))
        .withColumn("score",
          col("tf") * expr(s"(n_docs * ${IdfScale}L) div df"))
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(desc("score"), asc("token"))).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("tf").cast("long"),
          col("df").cast("long"), col("score").cast("long"), col("rnk"))
        .orderBy("doc_id", "rnk")
  }

  /** The standing search query for [[qKeywordSearch]]. */
  val SearchTerms: Seq[String] = Seq("spark", "join", "window")

  /** Term search over the corpus: score = Σ tf·idf over the query terms,
    * top-10 documents. The token filter lands right after the explode,
    * so only query-term postings survive into the aggregate; idf for
    * the ≤3 terms is a broadcast; the final top-k is a
    * TakeOrderedAndProject heap, never a global sort. */
  val qKeywordSearch: Q = Q("q_keyword_search",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
       |  WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
       |df AS (
       |  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
       |  WHERE token IN ('spark', 'join', 'window') GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT t.doc_id,
       |  CAST(SUM(t.tf * ((n.n_docs * $IdfScale) // d.df)) AS BIGINT)
       |    AS score,
       |  CAST(COUNT(*) AS BIGINT) AS n_terms
       |FROM tf t JOIN df d ON d.token = t.token CROSS JOIN n
       |GROUP BY t.doc_id
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    val tok = docs(s, d)
      .select(col("doc_id"), explode(TextHash.tokens(col("text")))
        .as("token"))
      .filter(col("token").isin(SearchTerms: _*))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = tok.groupBy("token")
      .agg(countDistinct("doc_id").as("df"))
    tf.join(broadcast(df_), "token")
      .crossJoin(broadcast(docCount(s, d)))
      .groupBy("doc_id")
      .agg(sum(col("tf") * expr(s"(n_docs * ${IdfScale}L) div df"))
        .cast("long").as("score"),
        count(lit(1)).cast("long").as("n_terms"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(10)
  }

  /** BM25 document search over the same standing query — the retrieval
    * scorer tf·idf lacks: per-term diminishing returns (tf saturation at
    * k1 = 1.2) and document-length normalization (b = 0.75 against the
    * corpus mean length). This is the deterministic FIXED-POINT variant:
    * with k1 = 6/5 and b = 3/4, per (doc, term)
    *
    *   score = idf · 22000·tf div (10·tf + 3 + nrm),
    *   nrm   = (9·dl·N) div DL   (the ⌊9·dl/avgdl⌋ length penalty),
    *
    * idf the [[IdfScale]] micro-idf (the BM25 ln-idf is engine-divergent;
    * any monotone inverse-df transform preserves the ranking), every
    * division a floor over exact BIGINTs (max ≈ N·10⁶·22·tf·10³ ≈ 10¹⁶
    * at sf0.1 — long-safe), and the per-doc total a SUM of integers — no
    * FP anywhere, so the oracle hash-matches bit-for-bit.
    *
    * Scale shape = [[qKeywordSearch]] plus one per-doc length aggregate
    * (map-side combined; dl joins the posting side, which the query
    * terms already pruned): postings filter right after the explode, df
    * and the (N, DL) totals broadcast, top-10 via the
    * TakeOrderedAndProject heap. */
  val qBm25Search: Q = Q("q_bm25_search",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok
       |       GROUP BY 1),
       |tf AS (
       |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
       |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
       |       GROUP BY 1),
       |tot AS (SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       |    (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS dl_total),
       |sc AS (SELECT t.doc_id,
       |         (((n.n_docs * $IdfScale) // d.df) * 22 * t.tf * 1000)
       |           // (10 * t.tf + 3 + (9 * l.dl * n.n_docs) // n.dl_total)
       |           AS s,
       |         l.dl AS dl
       |       FROM tf t JOIN df d ON d.token = t.token
       |       JOIN dl l ON l.doc_id = t.doc_id
       |       CROSS JOIN tot n)
       |SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score,
       |       CAST(COUNT(*) AS BIGINT) AS n_terms,
       |       CAST(MAX(dl) AS BIGINT) AS dl
       |FROM sc GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 10"""
      .stripMargin) { (s, d) =>
    val tok = docs(s, d)
      .select(col("doc_id"), explode(TextHash.tokens(col("text")))
        .as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("token").isin(SearchTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val tot = docs(s, d).agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum("dl").as("dl_total")))
    tf.join(broadcast(df_), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        expr(s"(((n_docs * ${IdfScale}L) div df) * 22 * tf * 1000) div " +
          "(10 * tf + 3 + (9 * dl * n_docs) div dl_total)").as("s"),
        col("dl"))
      .groupBy("doc_id")
      .agg(sum("s").cast("long").as("score"),
        count(lit(1)).cast("long").as("n_terms"),
        max("dl").cast("long").as("dl"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(10)
  }

  /** Minimum bigram support for collocation candidates: prunes the tail
    * BEFORE any join, so the candidate set is collocation-sized. */
  val MinSupport = 5

  /** PMI-style collocation mining: top-20 adjacent-token bigrams by
    * lift = n_xy·N / (n_x·n_y) (PMI = ln(lift), monotone — ranking is
    * identical and ln is engine-divergent, so lift stays the score).
    * The numerator/denominator products are exact BIGINTs and the one
    * double division per row is bit-equal across engines. Bigrams come
    * from zip_with over shifted slices (linear; never element_at over a
    * re-inlinable transform — NOTES gotcha). */
  val qPmiBigrams: Q = Q("q_pmi_bigrams",
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS tok FROM t),
       |ux AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM u
       |       GROUP BY 1),
       |bgi AS (SELECT unnest(range(1, len(toks))) AS i, toks FROM t),
       |bg AS (SELECT toks[CAST(i AS INT)] AS x,
       |              toks[CAST(i + 1 AS INT)] AS y FROM bgi),
       |bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport),
       |nb AS (SELECT CAST(SUM(len(toks) - 1) AS BIGINT) AS nb FROM t)
       |SELECT b.x, b.y, b.n_xy, gx.n AS n_x, gy.n AS n_y,
       |  CAST(b.n_xy * nb.nb AS DOUBLE) / CAST(gx.n * gy.n AS DOUBLE)
       |    AS lift
       |FROM bc b JOIN ux gx ON gx.tok = b.x JOIN ux gy ON gy.tok = b.y
       |CROSS JOIN nb
       |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin) { (s, d) =>
    val t = docs(s, d)
      .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
    val uni = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("n"))
    val bigrams = t.select(explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a: Column, b: Column) => struct(a.as("x"), b.as("y")))).as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast("long").as("n_xy"))
      .filter(col("n_xy") >= MinSupport)
    val nb = t.agg(sum(size(col("toks")) - 1).cast("long").as("nb"))
    bigrams
      .join(uni.withColumnRenamed("tok", "x")
        .withColumnRenamed("n", "n_x"), "x")
      .join(uni.withColumnRenamed("tok", "y")
        .withColumnRenamed("n", "n_y"), "y")
      .crossJoin(broadcast(nb))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        ((col("n_xy") * col("nb")).cast("double") /
          (col("n_x") * col("n_y")).cast("double")).as("lift"))
      .orderBy(desc("lift"), asc("x"), asc("y"))
      .limit(20)
  }

  /** Bigram surprisal — the model-free perplexity proxy: a document's
    * mean inverse-bigram-frequency, scored against the corpus's own
    * bigram statistics. A fluent document reuses common bigrams; token
    * salad (bad OCR, boilerplate splice, lorem noise) is built from
    * rare ones, so the top of this ranking is exactly the "perplexity
    * filter" cut of a curation pipeline — without a language model.
    * Per bigram the rarity is the integer (NB·1000) div n_xy (NB =
    * total corpus bigrams); the document score is the floor mean —
    * integers end to end, hash-exact across engines.
    *
    * Scale shape: bigrams by zip_with over shifted slices (linear,
    * never element_at over a re-inlinable transform — NOTES gotcha);
    * the bigram-count table is vocabulary²-bounded and broadcast, the
    * 1-row NB total broadcast; one (doc_id) aggregate and a top-20
    * TakeOrderedAndProject heap. */
  val qBigramSurprisal: Q = Q("q_bigram_surprisal",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bgi AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
      |        FROM t),
      |bg AS (SELECT doc_id, toks[CAST(i AS INT)] AS x,
      |              toks[CAST(i + 1 AS INT)] AS y FROM bgi),
      |bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg
      |       GROUP BY 1, 2),
      |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bg),
      |sc AS (SELECT g.doc_id,
      |         CAST(SUM((nb.nb * 1000) // c.n_xy) AS BIGINT) AS s,
      |         CAST(COUNT(*) AS BIGINT) AS n_bg
      |       FROM bg g JOIN bc c ON c.x = g.x AND c.y = g.y
      |       CROSS JOIN nb
      |       GROUP BY 1)
      |SELECT doc_id, (s // n_bg) AS surprisal, n_bg
      |FROM sc ORDER BY surprisal DESC, doc_id LIMIT 20"""
      .stripMargin) { (s, d) =>
    val t = docs(s, d)
      .select(col("doc_id"), TextHash.tokens(col("text")).as("toks"))
    val bg = t.select(col("doc_id"), explode(zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a: Column, b: Column) => struct(a.as("x"), b.as("y")))).as("bgs"))
      .select(col("doc_id"), col("bgs.x").as("x"), col("bgs.y").as("y"))
    val bc = bg.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val nb = bg.agg(count(lit(1)).as("nb"))
    bg.join(broadcast(bc), Seq("x", "y"))
      .crossJoin(broadcast(nb))
      .groupBy("doc_id")
      .agg(sum(expr("(nb * 1000) div n_xy")).cast("long").as("s"),
        count(lit(1)).cast("long").as("n_bg"))
      .select(col("doc_id"), expr("s div n_bg").as("surprisal"),
        col("n_bg"))
      .orderBy(desc("surprisal"), asc("doc_id"))
      .limit(20)
  }

  /** Minimum posting-list length for [[qPostingGaps]] — the report is
    * about index-worthy terms, and gaps need at least a handful of
    * entries to mean anything. */
  val MinDfGaps = 16L

  /** Posting-list delta-gap statistics: per index term, the doc-id gap
    * profile (max gap + mean gap ×100) of its sorted posting list — the
    * quantity that decides delta-varint compression ratios and zone-map
    * skip effectiveness when the index is laid out on disk.
    *
    * The scalable part is the LAG: per-term sorted adjacency via
    * `lag().over(partitionBy(token))` would funnel each term's whole
    * posting list through one reducer (a universal token's list IS the
    * corpus). Instead the ranks come from
    * [[graft.text.TextOps.groupedRankByRange]] (range slices keyed
    * (token, doc_id) — a fat term spans slices) and the predecessor is
    * recovered by an equi-join on (token, rank−1), hash-distributed on
    * both keys. Mean gap needs no adjacency at all: consecutive gaps
    * telescope, so mean = (max_doc − min_doc)/(df−1) — one plain
    * aggregate. Integer floor arithmetic end to end. */
  val qPostingGaps: Q = Q("q_posting_gaps",
    s"""WITH post AS (SELECT DISTINCT doc_id, token FROM (
       |         SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |         FROM documents)),
       |r AS (SELECT token, doc_id,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY token
       |          ORDER BY doc_id) AS BIGINT) AS rk,
       |        CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS df
       |      FROM post),
       |g AS (SELECT a.token, a.df, a.doc_id - b.doc_id AS gap
       |      FROM r a JOIN r b ON b.token = a.token AND b.rk = a.rk - 1),
       |sp AS (SELECT token, MIN(doc_id) AS mind, MAX(doc_id) AS maxd
       |       FROM post GROUP BY 1)
       |SELECT g.token, g.df, CAST(MAX(g.gap) AS BIGINT) AS max_gap,
       |       CAST(((sp.maxd - sp.mind) * 100) // (g.df - 1) AS BIGINT)
       |         AS mean_gap_x100
       |FROM g JOIN sp ON sp.token = g.token
       |WHERE g.df >= $MinDfGaps
       |GROUP BY g.token, g.df, sp.maxd, sp.mind
       |ORDER BY g.df DESC, g.token LIMIT 20""".stripMargin) { (s, d) =>
    val post = docs(s, d)
      .select(col("doc_id"),
        explode(TextHash.tokens(col("text"))).as("token"))
      .distinct()
    val ranked = graft.text.TextOps.groupedRankByRange(post, Seq("token"),
      Seq(col("doc_id").asc))
    val prev = ranked.select(col("token").as("tk"),
      (col("rnk") + 1).as("rnk2"), col("doc_id").as("prev_doc"))
    val gaps = ranked
      .join(prev, col("token") === col("tk") && col("rnk") === col("rnk2"))
      .select(col("token"), col("n_group").as("df"),
        (col("doc_id") - col("prev_doc")).as("gap"))
    val spans = post.groupBy("token")
      .agg(min("doc_id").as("mind"), max("doc_id").as("maxd"))
    gaps.groupBy("token", "df")
      .agg(max("gap").cast("long").as("max_gap"))
      .join(spans, Seq("token"))
      .filter(col("df") >= MinDfGaps)
      .select(col("token"), col("df"), col("max_gap"),
        expr("CAST(((maxd - mind) * 100) div (df - 1) AS BIGINT)")
          .as("mean_gap_x100"))
      .orderBy(desc("df"), asc("token")).limit(20)
  }

  /** Hot-shingle guard for [[qDocSimWeighted]] — shingles in more docs
    * than this are stopword-like and excluded before pair generation
    * (the q_ngram_jaccard_pairs df-cap, reapplied). */
  val SimDfCap = 64

  /** Per-(doc, shingle) occurrence clamp (tf saturation, the BM25
    * posture). With the corpus-size-INDEPENDENT idf below, a weight is
    * ≤ 31·(10⁶/2) ≈ 1.55·10⁷ on any shared shingle (shared ⇒ df ≥ 2),
    * so a pair term is ≤ 2.4·10¹⁴ and a pair's dot overflows long only
    * past ~38,000 max-weight shared shingles — no real document pair
    * gets there (a pair's shared-shingle count is bounded by its
    * shorter document's window count, and those are boilerplate, not
    * max-rarity, shingles). */
  val SimTfClamp = 31L

  /** Inverse-df weight in micro-units: 10⁶ div df — deliberately NOT
    * scaled by corpus size (idf's N numerator is one corpus-wide
    * constant, so dropping it preserves the rarity ordering up to floor
    * rounding — and keeps every weight bounded at ANY corpus size). */
  val SimIdfScale = 1000000L

  /** Weighted document-pair similarity via the inverted 3-gram shingle
    * index: pairs ranked by the tf·idf dot product of their shingle
    * occurrence profiles — where [[graft.dedup.Dedup]]'s Jaccard scores
    * SET resemblance, this weights matches by rarity (idf) and
    * repetition (tf), the sparse-vector similarity used for
    * template/boilerplate discovery.
    *
    * Candidate generation is the inverted-index equi-join on the
    * shingle hash — never an all-pairs product; [[SimDfCap]] bounds
    * per-shingle fan-out at cap² pairs, the same linearity guard proven
    * for the Jaccard pipeline. Weights are exact integers bounded at
    * ANY corpus size: tf clamped at [[SimTfClamp]] × inverse-df micro
    * units ([[SimIdfScale]] floor-div df — overflow analysis on the
    * clamp). One aggregate per pair, heap top-20. */
  val qDocSimWeighted: Q = Q("q_doc_sim_weighted",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
       |           FROM documents),
       |th AS (SELECT doc_id,
       |        list_transform(w, t -> ${TextHash.hash32Sql("t")}) AS t
       |       FROM words),
       |ws AS (SELECT doc_id, ${TextHash.windowHashesSql("t", 3)} AS ws
       |       FROM th),
       |ex AS (SELECT doc_id, unnest(ws) AS h FROM ws),
       |tf AS (SELECT doc_id, h,
       |         CAST(least(COUNT(*), $SimTfClamp) AS BIGINT) AS tf
       |       FROM ex GROUP BY 1, 2),
       |df AS (SELECT h, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1
       |       HAVING COUNT(*) <= $SimDfCap),
       |wt AS (SELECT tf.doc_id, tf.h,
       |         tf.tf * ($SimIdfScale // df.df) AS w
       |       FROM tf JOIN df ON df.h = tf.h),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(COUNT(*) AS BIGINT) AS n_shared,
       |         CAST(SUM(a.w * b.w) AS BIGINT) AS dot
       |       FROM wt a JOIN wt b ON b.h = a.h AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared, dot FROM pr
       |ORDER BY dot DESC, doc_a, doc_b LIMIT 20""".stripMargin) { (s, d) =>
    // the weighted trigram posting index is session-memoized (r9): the
    // explode→tf→df→weight pipeline — formerly run once per query via
    // exchange reuse across the two pair sides — now materializes once
    // per session, and BOTH pair sides scan the checkpointed index
    // (the semdedup/ivfRanked posture, plan-spec-guarded via
    // ExistingRDD)
    val wt = graft.plans.FrameMemo.memo(s, "simWt", d) {
      val ex = TextHash.addWindowHashes(docs(s, d), col("text"), 3)
        .select(col("doc_id"), explode(col("ws")).as("h"))
      val tf = ex.groupBy("doc_id", "h")
        .agg(least(count(lit(1)), lit(SimTfClamp)).cast("long").as("tf"))
      val df_ = tf.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= SimDfCap)
      tf.join(df_, "h")
        .select(col("doc_id"), col("h"),
          (col("tf") * expr(s"${SimIdfScale}L div df")).as("w"))
    }.hint("shuffle_hash")
    wt.as("a").join(wt.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"),
        sum(col("a.w") * col("b.w")).cast("long").as("dot"))
      .orderBy(desc("dot"), asc("doc_a"), asc("doc_b")).limit(20)
  }

  /** Distinctive vocabulary per corpus slice (the c-TF-IDF / "what makes
    * this source different" report): for every source, the top-5 tokens
    * by smoothed RATE RATIO — how much more often the token occurs in
    * the source than in the rest of the corpus. The slice-profiling
    * diagnostic a curation run reads before reweighting sources.
    *
    * Score is an integer milli-ratio with +1 smoothing on the
    * complement: lift = (n_st·(N−N_s)·1000) div ((n_t−n_st+1)·N_s) —
    * floor divisions of longs, no FP accumulation. Overflow headroom:
    * the numerator is ≤ n_st·N·1000, safe in longs to N ≈ 10⁹ tokens
    * per hot (token, source) cell; a trillion-token corpus widens the
    * product to DECIMAL(38,0) (the q_anomaly_days HUGEINT discipline) —
    * same plan, wider type. Shapes: one
    * (source, token) aggregate (data-scaled keys, map-side combine);
    * token totals and source totals are vocab/domain-bounded frames
    * joined back (token equi-join + broadcast source totals + 1-row N);
    * the final window ranks within the vocab×sources-bounded aggregate,
    * never over corpus rows. */
  val qSourceTerms: Q = Q("q_source_terms",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |st AS (SELECT source, tok, COUNT(*)::BIGINT AS n_st FROM tok
      |       GROUP BY 1, 2),
      |tt AS (SELECT tok, CAST(SUM(n_st) AS BIGINT) AS n_t FROM st
      |       GROUP BY 1),
      |ns AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st
      |       GROUP BY 1),
      |nn AS (SELECT CAST(SUM(n_st) AS BIGINT) AS n FROM st),
      |sc AS (SELECT st.source, st.tok, st.n_st,
      |         (st.n_st * (nn.n - ns.n_s) * 1000)
      |           // ((tt.n_t - st.n_st + 1) * ns.n_s) AS lift_milli
      |       FROM st JOIN tt ON tt.tok = st.tok
      |       JOIN ns ON ns.source = st.source CROSS JOIN nn),
      |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY lift_milli DESC, tok) AS BIGINT) AS rnk
      |      FROM sc)
      |SELECT source, tok, n_st, CAST(lift_milli AS BIGINT) AS lift_milli,
      |       rnk
      |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin) { (s, d) =>
    val st = docs(s, d)
      .select(col("source"),
        explode(TextHash.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("n_st"))
    val tt = st.groupBy("tok").agg(sum("n_st").as("n_t"))
    val ns = st.groupBy(col("source").as("src"))
      .agg(sum("n_st").as("n_s"))
    val nn = st.agg(sum("n_st").as("n"))
    val sc = st.join(tt, "tok")
      .join(broadcast(ns), col("source") === col("src"))
      .crossJoin(broadcast(nn))
      .select(col("source"), col("tok"), col("n_st").cast("long").as("n_st"),
        expr("(n_st * (n - n_s) * 1000) div ((n_t - n_st + 1) * n_s)")
          .as("lift_milli"))
    val w = Window.partitionBy("source")
      .orderBy(desc("lift_milli"), asc("tok"))
    sc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("source", "rnk")
  }

  val all: Seq[Q] =
    Seq(qChunkOverlap, qTfidfTerms, qKeywordSearch, qBm25Search,
      qPmiBigrams, qBigramSurprisal, qPostingGaps, qDocSimWeighted,
      qSourceTerms)
}
