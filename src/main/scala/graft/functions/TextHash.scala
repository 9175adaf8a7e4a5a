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

  /** 32-bit string hash portable to any engine with md5: first 8 hex chars
    * as an integer, reduced mod P. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % P

  /** The same hash in DuckDB SQL, for oracle generation. */
  def hash32Sql(expr: String): String =
    s"('0x' || substring(md5($expr), 1, 8))::BIGINT % $P"

  /** Word n-gram shingles (default 3) of a token array; empty below n
    * tokens (sequence(1, k) with k < 1 would count *down* in Spark). */
  def shingles(words: Column, n: Int = 3): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct hashed shingle set of a text column — the unit of Jaccard
    * resemblance for all near-dup operators. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(tokens(text), n), s => hash32(s)))

  /** DuckDB twin of [[shingleHashes]] given a text expression; `w` must be
    * bound as string_split(text, ' ') by the caller's CTE. */
  def shingleHashesSql(w: String, n: Int = 3): String = {
    val shingle = (0 until n).map(k => s"$w[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($w) - ${n - 2}), " +
      s"i -> ${hash32Sql(shingle)}))"
  }

  /** MinHash value k (0-based) over a hashed-shingle array column. */
  def minhash(hs: Column, k: Int): Column =
    array_min(transform(hs, h => (lit(As(k)) * h + lit(Bs(k))) % lit(P)))

  /** DuckDB twin of [[minhash]]. */
  def minhashSql(hs: String, k: Int): String =
    s"list_min(list_transform($hs, h -> (${As(k)}::BIGINT * h + ${Bs(k)}) % $P))"
}
