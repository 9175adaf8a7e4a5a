package graft.tools

import org.apache.spark.sql.SparkSession

/** Deterministic hierarchical Gaussian-mixture embeddings fixture
  * (VERDICT r8 missing #1 / next #3): the driver testdata's
  * near-uniform random vectors are the adversarial WORST case for every
  * structure-exploiting ANN tier (no cluster for IVF cells, LSH bands,
  * or PQ codewords to latch onto), which left the weakest tiers'
  * absolute recall floors at a near-vacuous 2-3/30. Real embedding
  * corpora are the opposite — encoder outputs concentrate on
  * topic manifolds with near-duplicate micro-structure — so the floors
  * that certify "this tier still retrieves" need a corpus with
  * structure AT EACH TIER'S RESOLUTION:
  *
  *   - 10 topic clusters (unit-norm Gaussian centers, pairwise cosine
  *     ≈ 0 ± 0.13 at d = 64) — what IVF cells and LSH bands resolve;
  *   - 10 subgroups per cluster (sub-center = normalize(center +
  *     0.15·N), within-cluster cross-subgroup cosine ≈ 0.5) — what PQ
  *     codewords can resolve (sub-center offsets are comparable to
  *     codeword spacing, so subgroups land on distinct codes);
  *   - 5 near-dup members per subgroup (point = sub-center + 0.02·N,
  *     within-subgroup cosine ≈ 0.97) — a query's exact top-3 are
  *     always its 4 subgroup siblings, separated from everything else
  *     by a ≈ 0.97 vs ≈ 0.5 cosine cliff that int8 quantization noise
  *     (≈ 0.01) cannot blur. A flat single-σ mixture FAILS here: every
  *     same-cluster candidate is equidistant, rank gaps shrink below
  *     quantization error, and the quantized tiers score ≈ 2/30
  *     (measured r9) — structurally low recall, not a tier bug.
  *   - 3 BRIDGE points per cluster (ids 460-489): geometry of the
  *     query's own subgroup at 3× its noise (cosine ≈ 0.89 to the
  *     query — below all 4 true siblings, above everything else) but
  *     label = cluster+1 mod 10. These are planted boundary/mislabel
  *     points — exactly what hard-negative mining exists to surface —
  *     and they make the hard_neg tier's ground truth resolvable
  *     (otherwise the label-complement top-3 sits in the cross-cluster
  *     cosine ≈ 0 noise floor where no quantized tier can rank).
  *
  * Shape mirrors the testdata table exactly (`vec_id BIGINT, embedding
  * ARRAY<FLOAT>, label INT`, 500 rows, 64 dims, labels 0-9) so every
  * registered tier query runs unchanged on the fixture directory:
  * cluster(id) = id % 10 stripes the 10 probe queries (vec_id < 10)
  * into 10 different clusters; subgroup(id) = (id/10) % 10 puts the
  * queries in subgroup 0 with siblings {id+100, ..., id+400}; the fixed
  * anchor/seed id windows (IVF anchors 100-115, PQ codewords 200-203)
  * land on in-cluster points, exercising every tier's real assignment
  * path. Labels equal the geometric cluster everywhere EXCEPT the 30
  * bridge points.
  *
  * Seeded `java.util.Random(42)` driver-side generation — 500×64 floats
  * is a bounded fixture, not a data-scaled operator — written as one
  * parquet table so specs point a tier at the directory like any sfDir.
  */
object ClusteredEmbFixture {

  val N = 500
  val Dim = 64
  val K = 10
  /** Cluster → sub-center spread. */
  val SigmaCluster = 0.15
  /** Sub-center → member spread (near-dup tightness). */
  val SigmaSub = 0.02
  /** First bridge id; 3 per cluster, ids [BridgeBase, BridgeBase+30). */
  val BridgeBase = 460

  private def isBridge(id: Int): Boolean =
    id >= BridgeBase && id < BridgeBase + 3 * K

  /** The mixture, deterministically: (vec_id, embedding, label). */
  def rows(): Seq[(Long, Array[Float], Int)] = {
    val rnd = new java.util.Random(42L)
    def gaussian(dim: Int): Array[Double] =
      Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(K)(normalize(gaussian(Dim)))
    val subCenters = Array.tabulate(K, K) { (k, _) =>
      val g = gaussian(Dim)
      normalize(Array.tabulate(Dim)(i => centers(k)(i) + SigmaCluster * g(i)))
    }
    (0 until N).map { id =>
      val k = id % K
      val noise = gaussian(Dim)
      if (isBridge(id)) {
        // boundary point: sits beside cluster k's QUERY subgroup (0) at
        // 3× member noise, but carries the NEXT cluster's label
        val sc = subCenters(k)(0)
        val v = Array.tabulate(Dim)(i =>
          (sc(i) + 3 * SigmaSub * noise(i)).toFloat)
        (id.toLong, v, (k + 1) % K)
      } else {
        val j = (id / 10) % K
        val sc = subCenters(k)(j)
        val v = Array.tabulate(Dim)(i =>
          (sc(i) + SigmaSub * noise(i)).toFloat)
        (id.toLong, v, k)
      }
    }
  }

  /** Write `<out>/embeddings.parquet`; idempotent overwrite. */
  def write(s: SparkSession, out: String): Unit = {
    import s.implicits._
    rows().toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** SCALED variant of the mixture for octave studies (r13: the
    * derived-IVF-cells recall trajectory needs clustered geometry at
    * growing N — uniform random vectors are the structure-free worst
    * case where NO sublinear probe can hold recall): same K clusters ×
    * K subgroups, `members` points per subgroup (N = K·K·members), no
    * bridge points. id → (cluster, subgroup) keeps the modular layout
    * (id % K, (id/K) % K) so the anchor window (vec_id 100..) spans all
    * clusters at every size. */
  def rowsScaled(members: Int): Seq[(Long, Array[Float], Int)] = {
    val rnd = new java.util.Random(42L)
    def gaussian(dim: Int): Array[Double] =
      Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(K)(normalize(gaussian(Dim)))
    val subCenters = Array.tabulate(K, K) { (k, _) =>
      val g = gaussian(Dim)
      normalize(Array.tabulate(Dim)(i => centers(k)(i) + SigmaCluster * g(i)))
    }
    (0 until K * K * members).map { id =>
      val k = id % K
      val j = (id / K) % K
      val noise = gaussian(Dim)
      val sc = subCenters(k)(j)
      val v = Array.tabulate(Dim)(i =>
        (sc(i) + SigmaSub * noise(i)).toFloat)
      (id.toLong, v, k)
    }
  }

  /** Write the scaled mixture to `<out>/embeddings.parquet`. */
  def writeScaled(s: SparkSession, out: String, members: Int): Unit = {
    import s.implicits._
    rowsScaled(members).toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_clustered_emb")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional second arg: members per subgroup → the SCALED mixture
    args.drop(1).headOption.map(_.toInt) match {
      case Some(m) => writeScaled(spark, out, m)
      case None => write(spark, out)
    }
    println(s"[clustered-emb] wrote $out/embeddings.parquet")
    spark.stop()
  }
}
