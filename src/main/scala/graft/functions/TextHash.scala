package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing for the dedup/fingerprint
  * operators.
  *
  * Every hash is defined purely in terms of md5 + integer arithmetic so the
  * DuckDB oracle can compute bit-identical values: Spark's own hash
  * functions (xxhash64, murmur) have no cross-engine twin. The 32-bit token
  * hash is `int(md5(s)[0:8], 16) mod P` with P = 2^31−1, keeping every
  * product `a*h + b` inside signed-64 range (a,h < 2^31 → a*h < 2^62).
  *
  * MinHash background: Broder, "On the resemblance and containment of
  * documents" (1997); banding analysis per Leskovec/Rajaraman/Ullman,
  * Mining of Massive Datasets ch.3.
  */
object TextHash {

  /** Modulus for all 32-bit-ish hashing: 2^31 − 1 (Mersenne prime). */
  val P: Long = 2147483647L

  /** MinHash family size and LSH banding shape: K = BANDS × R. With
    * R = 4, BANDS = 4 the candidate probability at Jaccard s is
    * 1−(1−s⁴)⁴ ≈ 0.99 at s = 0.9 and ≈ 0.04 at s = 0.3 — tuned for the
    * ≥ 0.8 near-dup threshold. */
  val K = 16
  val Bands = 4
  val R = 4

  /** Fixed affine-hash coefficients (pure function of the index — no RNG,
    * so the oracle SQL can embed the same literals). */
  val As: Seq[Long] = (1 to K).map(i => ((2654435761L * i) % P) | 1L)
  val Bs: Seq[Long] = (1 to K).map(i => (40503L * 69069L * i) % P)

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** The staging column [[addShingleHashes]]/[[addWindowHashes]] thread
    * through their projection pipeline. Both helpers refuse an input that
    * already carries the name — silently overwriting and then dropping a
    * caller's column of the same name would corrupt caller data. */
  private val TempCol = "__graft_th"

  private def requireTempFree(df: org.apache.spark.sql.DataFrame): Unit =
    require(!df.columns.contains(TempCol),
      s"input already has a '$TempCol' column - rename it before hashing")

  /** 32-bit string hash portable to any engine with md5: first 8 hex chars
    * as an integer, reduced mod P. Composed-builtins form — the reference
    * semantics and what the DuckDB oracle mirrors. */
  def hash32Composed(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % P

  /** Same hash via the native codegen expression [[Md5Mod31]]
    * (value-identical, allocation-light). Requires
    * [[Md5Mod31.ensureRegistered]] on the session — [[graft.io.Tables.load]]
    * does this, so every registered query is covered. */
  def hash32(s: Column): Column = call_function(Md5Mod31.FunctionName, s)

  /** The same hash in DuckDB SQL, for oracle generation. */
  def hash32Sql(expr: String): String =
    s"('0x' || substring(md5($expr), 1, 8))::BIGINT % $P"

  /** Rolling-combine base for 3-gram shingle fingerprints. */
  val B = 131L

  /** Distinct 3-gram shingle fingerprints of `textCol`, added as column
    * `out` via a staged projection pipeline:
    *
    *   words = split(text) → th = per-token hash32 → shingle k =
    *   ((th(k)·B + th(k+1)) mod P · B + th(k+2)) mod P → distinct.
    *
    * Per-token md5 runs once (th is its own projection — inlining it into
    * the 3 lambda references would recompute it; Catalyst's
    * CollapseProject keeps multiply-referenced non-trivial aliases
    * staged), and per-shingle work is 4 integer ops — no string concat,
    * no re-split. All intermediate values < B·P < 2^39: overflow-safe and
    * reproducible in any 64-bit-integer engine. */
  def addShingleHashes(df: org.apache.spark.sql.DataFrame, textCol: Column,
      out: String = "hs"): org.apache.spark.sql.DataFrame = {
    requireTempFree(df)
    val th = col("__graft_th")
    // zip_with over shifted slices, NOT element_at(th, i) indexing: an
    // optimizer rule that inlines this expression (pushed-down inferred
    // filters do) would turn per-element indexing into a quadratic
    // re-evaluation of the token transform; slices keep any inlined copy
    // a linear pass.
    val k = size(th) - 2
    val combined = zip_with(
      zip_with(slice(th, lit(1), k), slice(th, lit(2), k),
        (a, b) => (a * B + b) % P),
      slice(th, lit(3), k), (ab, c) => (ab * B + c) % P)
    df.withColumn("__graft_th", transform(tokens(textCol), t => hash32(t)))
      .withColumn(out, array_distinct(
        when(size(th) >= 3, combined).otherwise(array().cast("array<long>"))))
      .drop("__graft_th")
  }

  /** DuckDB twin of [[addShingleHashes]]; `w` must be bound as
    * string_split(text, ' ') by the caller's CTE, and the result expects
    * an intermediate `th` alias in scope (see [[shingleCteSql]]). */
  def shingleHashesSql(th: String): String =
    s"list_distinct(list_transform(range(1, len($th) - 1), " +
      s"i -> (($th[i]*$B + $th[i+1]) % $P * $B + $th[i+2]) % $P))"

  /** Oracle CTE chain binding tokens → token hashes → shingle set `hs`
    * for `documents`. */
  def shingleCteSql: String =
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w
       |           FROM documents),
       |th AS (SELECT doc_id,
       |        list_transform(w, t -> ${hash32Sql("t")}) AS t FROM words),
       |sh AS (SELECT doc_id, ${shingleHashesSql("t")} AS hs FROM th)"""
      .stripMargin

  /** ALL k-token window fingerprints of `textCol` (positions kept, NOT
    * deduplicated — occurrence counts are the point), added as column
    * `out`: the generalisation of [[addShingleHashes]] to arbitrary k by
    * folding the rolling combine over k shifted slices. Same staging and
    * overflow discipline: per-token md5 once, per-window work is k−1
    * integer ops, every intermediate < B·P < 2^39. */
  def addWindowHashes(df: org.apache.spark.sql.DataFrame, textCol: Column,
      k: Int, out: String = "ws"): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"window needs >= 2 tokens, got $k")
    requireTempFree(df)
    val th = col("__graft_th")
    val n = size(th) - (k - 1)
    val combined = (2 to k).foldLeft(slice(th, lit(1), n)) { (acc, j) =>
      zip_with(acc, slice(th, lit(j), n), (a, b) => (a * B + b) % P)
    }
    df.withColumn("__graft_th", transform(tokens(textCol), t => hash32(t)))
      .withColumn(out,
        when(size(th) >= k, combined).otherwise(array().cast("array<long>")))
      .drop("__graft_th")
  }

  /** DuckDB twin of [[addWindowHashes]]'s per-window fold; `th` must be
    * the token-hash list alias (see [[shingleCteSql]]'s `th` stage). */
  def windowHashesSql(th: String, k: Int): String = {
    val fold = (1 until k).foldLeft(s"$th[i]") { (acc, j) =>
      s"(($acc * $B + $th[i+$j]) % $P)"
    }
    s"list_transform(range(1, len($th) - ${k - 2}), i -> $fold)"
  }

  /** MinHash value k (0-based) over a hashed-shingle array column. */
  def minhash(hs: Column, k: Int): Column =
    array_min(transform(hs, h => (lit(As(k)) * h + lit(Bs(k))) % lit(P)))

  /** DuckDB twin of [[minhash]]. */
  def minhashSql(hs: String, k: Int): String =
    s"list_min(list_transform($hs, h -> (${As(k)}::BIGINT * h + ${Bs(k)}) % $P))"
}
