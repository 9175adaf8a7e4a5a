package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Q

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (array<float>, dim 64).
  *
  * Two paths:
  *   - brute-force cosine top-k — the exact baseline; O(queries × corpus)
  *     but embarrassingly parallel (each partition scores its slice, then
  *     a per-query top-k heap merges — TakeOrderedAndProject shape);
  *   - random-hyperplane LSH (Charikar 2002 SimHash for angles): J=8 fixed
  *     ±1 hyperplanes bucket vectors by sign pattern; queries only score
  *     their own bucket — the sub-linear scale path (equi-join on bucket,
  *     never a cross join).
  *
  * Determinism: all dot products are sequential left-folds over dim order
  * in double precision, which both Spark (`aggregate`) and DuckDB
  * (`list_dot_product`, verified sequential) compute bit-identically. The
  * hyperplanes are fixed integer-derived ±1 patterns, embedded as literals
  * in both engines.
  */
object Similarity {

  /** Number of hyperplanes (bucket bits) for the LSH path. */
  val Planes = 8
  val Dim = 64

  /** Deterministic ±1 hyperplane weights: sign from an LCG over the flat
    * plane×dim index (no RNG state — same literals in both engines). */
  val planeWeights: Seq[Seq[Double]] =
    (0 until Planes).map { j =>
      (0 until Dim).map { i =>
        val x = (1103515245L * (j * Dim + i) + 12345L) / 65536L
        if (x % 2 == 0) 1.0 else -1.0
      }
    }

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Sequential dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Queries = vec_id < 10 (fixed, scale-independent probe set). */
  private val QuerySet = "vec_id < 10"

  /** Brute-force cosine top-5 per query vector. */
  val qCosineTopk: Q = Q("q_cosine_topk",
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |q AS (SELECT * FROM n WHERE $QuerySet),
       |scored AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS cos
       |  FROM q JOIN n b ON b.vec_id != q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos_sim
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) {
    (s, d) =>
      val n = withNorm(emb(s, d))
      val q = n.filter(expr(QuerySet))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm"))
      val scored = q.join(n, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      val w = Window.partitionBy("query_id")
        .orderBy(desc("cos"), asc("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rnk"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy("query_id", "rnk")
  }

  /** Sign-bucket of a vector under the fixed hyperplanes. */
  def lshBucket(v: Column): Column =
    (0 until Planes).map { j =>
      val w = array(planeWeights(j).map(lit): _*)
      when(dot(v, w) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def lshBucketSql(v: String): String =
    (0 until Planes).map { j =>
      val lits = planeWeights(j).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($v, $lits::DOUBLE[]) > 0 " +
        s"THEN ${1L << j}::BIGINT ELSE 0 END)"
    }.mkString(" + ")

  /** LSH-bucketed ANN: candidates share the query's sign bucket; cosine
    * top-3 within the bucket. Lower recall than brute force by design —
    * the oracle runs the identical bucketing, so results still match
    * exactly. */
  val qAnnLsh: Q = Q("q_ann_lsh",
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |             CAST(${lshBucketSql("v")} AS BIGINT) AS bucket
       |      FROM e),
       |q AS (SELECT * FROM b WHERE $QuerySet),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos_sim
       |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) {
    (s, d) =>
      val b = withNorm(emb(s, d))
        .withColumn("bucket", lshBucket(col("v")))
      val q = b.filter(expr(QuerySet))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm"), col("bucket").as("qbucket"))
      val scored = q.join(b,
          col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      val w = Window.partitionBy("query_id")
        .orderBy(desc("cos"), asc("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rnk"),
          round(col("cos"), 6).as("cos_sim"))
        .orderBy("query_id", "rnk")
  }

  /** Multi-probe LSH ANN: each query also probes the J buckets at
    * Hamming distance 1 from its own (flip one sign bit) — the standard
    * recall fix for hyperplane LSH (Lv et al., VLDB'07 multi-probe):
    * near-neighbors that land just across one hyperplane are recovered
    * for J extra equi-join lookups instead of a wider scan. Candidates
    * stay an equi-join on bucket id. */
  val qAnnMultiprobe: Q = {
    val probesSql = (Seq("bucket") ++
      (0 until Planes).map(j => s"xor(bucket, ${1L << j})"))
      .mkString("[", ", ", "]")
    Q("q_ann_multiprobe",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |             CAST(${lshBucketSql("v")} AS BIGINT) AS bucket
         |      FROM e),
         |q AS (SELECT vec_id, v, nrm, unnest($probesSql) AS probe
         |      FROM b WHERE $QuerySet),
         |scored AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM q JOIN b c ON c.bucket = q.probe AND c.vec_id != q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos_sim
         |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) {
      (s, d) =>
        val b = withNorm(emb(s, d)).withColumn("bucket", lshBucket(col("v")))
        val probes = array((Seq(col("bucket")) ++
          (0 until Planes).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j)))): _*)
        val q = b.filter(expr(QuerySet))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"), explode(probes).as("probe"))
        val scored = q.join(b,
            col("bucket") === col("probe") &&
              col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
              .as("cos"))
          .distinct()
        val w = Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("neighbor_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("query_id"), col("neighbor_id"), col("rnk"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rnk")
    }
  }

  /** Embedding-cosine near-duplicate pairs (the embedding analog of
    * MinHash dedup): pairs bucketed by LSH, kept when cosine ≥ 0.95.
    * Candidate generation is the bucket equi-join — sub-linear, same
    * bucketing in the oracle. */
  val qEmbedNearDup: Q = Q("q_embed_near_dup",
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |             CAST(${lshBucketSql("v")} AS BIGINT) AS bucket
       |      FROM e)
       |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |       round(list_dot_product(a.v, c.v) / (a.nrm * c.nrm), 6)
       |         AS cos_sim
       |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |WHERE list_dot_product(a.v, c.v) / (a.nrm * c.nrm) >= 0.95
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    val b = withNorm(emb(s, d)).withColumn("bucket", lshBucket(col("v")))
    val a = b.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket").as("ba"))
    val cos = dot(col("va"), col("v")) / (col("na") * col("nrm"))
    a.join(b, col("ba") === col("bucket") && col("vec_a") < col("vec_id"))
      .filter(cos >= 0.95)
      .select(col("vec_a"), col("vec_id").as("vec_b"),
        round(cos, 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  val all: Seq[Q] = Seq(qCosineTopk, qAnnLsh, qAnnMultiprobe, qEmbedNearDup)
}
