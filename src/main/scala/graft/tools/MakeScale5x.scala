package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize the sweep's fourth octave (VERDICT r7 next #5): a 5×
  * corpus grown from sf0.1, so the steepest measured families
  * (q_pq_distortion α 0.70, q_substring_dups 0.65, q_source_overlap
  * 0.64, q_doc_sim_weighted 0.56 — SCALE.md round-7 tables) get one
  * point OUTSIDE the JVM-overhead-dominated regime. /root/testdata is
  * read-only, so the grown tables land under /tmp.
  *
  * Replication is PERTURBED, not verbatim — 5 copies of the same bytes
  * would manufacture a near-dup density no real corpus has and
  * quadratically inflate exactly the candidate-pair joins the sweep is
  * measuring, turning a scale measurement into a worst-case-skew
  * benchmark:
  *   - documents: replica r>0 swaps every 8th token for a
  *     replica-unique salt token (deterministic from (r, replaced
  *     token, pos) — CONTENT-derived, not doc_id-derived, per ADVICE
  *     r8: a doc_id-seeded salt gave two identical-text docs different
  *     salts, silently dissolving intra-replica exact/near-dup pairs).
  *     Intra-replica duplicate structure is preserved verbatim (docs
  *     that were near-dups stay near-dups in every replica — dup
  *     density per byte is unchanged); cross-replica 3-shingle overlap
  *     drops below candidate thresholds, exactly like independent
  *     corpus growth.
  *   - embeddings: replica r>0 rotates the vector by 7·r dims (norm
  *     and coordinate distribution preserved, cosine geometry
  *     decorrelated). ID spaces shift by r·1,000,000, far above the
  *     original ranges, so the fixed probe/anchor/seed sets
  *     (vec_id < 10, PQ anchors, Lloyd seeds) stay the originals —
  *     corpus grows, probes don't, which is what scale-up means.
  * orders/lineitem grow 5× too (r9 — they drive the graph family's
  * edge set; see the graph-octave block below); remaining tables
  * (dims, events) are copied verbatim by the caller.
  *
  * Run: `runMain graft.tools.MakeScale5x /root/testdata/sf0.1 /tmp/graft_sf5x`
  *
  * Optional third arg `out1x` (r10, VERDICT r9 wrong #3 — encoder
  * parity): also re-encode the UNREPLICATED grown tables with THIS
  * tool's writer into `out1x`, so both sweep points of the 5× octave
  * share one parquet encoder. The sf-series files are pyarrow-written
  * (RLE_DICTIONARY key columns) while this tool's output is
  * Spark-written; measuring sf0.1-as-shipped against the 5× point
  * therefore mixed per-row decode costs into sub-second timings —
  * the r9 relational octave's negative-α noise. With `out1x` both
  * points decode identically and the exponent isolates data growth. */
object MakeScale5x {

  private val Offset = 1000000L

  /** Replication factor (r11): default 5 keeps the established octave;
    * `GRAFT_SCALE_REPLICAS=25` grows a second octave above it (a
    * two-octave span shows a knee a single point can hide). Capped at 64
    * for two reasons: replica id spaces (r·Offset) must stay disjoint
    * and well under the fixed probe/anchor ranges' 10⁶ shift, and the
    * embedding perturbation rotates by (7·r) mod 64 dims — 7 is coprime
    * to 64, so rotations are distinct (and non-zero) exactly for
    * r ∈ 1..63; at r = 64 the rotation is the identity and replicas
    * would reproduce the base vectors verbatim, manufacturing cosine-1.0
    * duplicates that quadratically inflate every near-dup/ANN join the
    * sweep measures. */
  private val Replicas: Int =
    sys.env.get("GRAFT_SCALE_REPLICAS").map(_.toInt) match {
      case Some(n) if n >= 1 && n <= 64 => n
      case Some(n) => sys.error(s"GRAFT_SCALE_REPLICAS out of range: $n")
      case None => 5
    }

  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val out1x = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.io.Tables.load(spark, src, "documents")
    val docReps: Seq[DataFrame] = (0 until Replicas).map { r =>
      if (r == 0) docs
      else {
        val salted = array_join(
          transform(split(col("text"), " "), (t, i) =>
            when(i % 8 === 7,
              concat_ws("", lit(s"s${r}x"),
                pmod(hash(t, i), lit(999983)).cast("string")))
              .otherwise(t)), " ")
        docs.select((col("doc_id") + lit(r * Offset)).as("doc_id"),
          salted.as("text"), col("lang"), col("source"),
          length(salted).cast("long").as("n_chars"))
      }
    }
    // coalesce(1): the sf-series tables are SINGLE-file single-row-group
    // parquet, so their narrow pre-shuffle stages run one task; a 5×
    // table written as N files would get N-way scan parallelism and the
    // sweep would measure layout, not scale (measured r8: the first cut
    // of this tool wrote 8/32 files and half the families came out
    // FASTER at 5× than at 1×). Same layout ⇒ same parallelism ⇒ the
    // exponent isolates data growth.
    docReps.reduce(_ unionAll _).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out1x.foreach(o => docs.coalesce(1)
      .write.mode("overwrite").parquet(s"$o/documents.parquet"))

    val emb = graft.io.Tables.load(spark, src, "embeddings")
    val embReps: Seq[DataFrame] = (0 until Replicas).map { r =>
      if (r == 0) emb
      else {
        val n = 64
        val rot = (7 * r) % n
        val rotated = concat(
          slice(col("embedding"), rot + 1, n - rot),
          slice(col("embedding"), 1, rot))
        emb.select((col("vec_id") + lit(r * Offset)).as("vec_id"),
          rotated.as("embedding"), col("label"))
      }
    }
    embReps.reduce(_ unionAll _).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out1x.foreach(o => emb.coalesce(1)
      .write.mode("overwrite").parquet(s"$o/embeddings.parquet"))

    // Graph octave (r9, VERDICT r8 missing #2): the graph family derives
    // its edges from orders⋈lineitem, so those two tables grow 5× as
    // well — every key column shifts by r·Offset (orderkey links the
    // two tables inside a replica; custkey/suppkey/partkey keep the
    // replica node spaces disjoint, so the 5× graph is 5 disconnected
    // copies: nodes ×5, edges ×5, degree distribution preserved — no
    // artificial hub that would turn a scale measurement into a skew
    // benchmark). Non-key columns ride verbatim, so quantity filters
    // (triangles/butterflies) select the same per-replica subgraph.
    // Seed sets (BFS nation-0 customers, PPR custkey ≤ 5) live in the
    // verbatim-copied dims / original id range: corpus grows, probes
    // don't. Same coalesce(1) layout-parity rule as above.
    val ord = graft.io.Tables.load(spark, src, "orders")
    val ordReps = (0 until Replicas).map { r =>
      if (r == 0) ord
      else ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(r * Offset))
        .withColumn("o_custkey", col("o_custkey") + lit(r * Offset))
    }
    ordReps.reduce(_ unionAll _).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    out1x.foreach(o => ord.coalesce(1)
      .write.mode("overwrite").parquet(s"$o/orders.parquet"))

    val li = graft.io.Tables.load(spark, src, "lineitem")
    val liReps = (0 until Replicas).map { r =>
      if (r == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + lit(r * Offset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * Offset))
        .withColumn("l_partkey", col("l_partkey") + lit(r * Offset))
    }
    liReps.reduce(_ unionAll _).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    out1x.foreach(o => li.coalesce(1)
      .write.mode("overwrite").parquet(s"$o/lineitem.parquet"))

    spark.stop()
  }
}
