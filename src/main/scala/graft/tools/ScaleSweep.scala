package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale sweep of the heavy/iterative query families across the three
  * test scale factors (VERDICT r6 #3): time-vs-rows curves are the
  * cheapest super-linearity detector we have — a family whose measured
  * exponent is well above 1 over the 100× sf0.001→sf0.1 range is a bug
  * report on its own plan, whatever the gates say.
  *
  * Per (sf, query): two warmups + median/min of 3 `count()` runs (the
  * Bench protocol, shortened — the sweep compares a query AGAINST ITSELF
  * across scales, so cross-run noise matters less than in the headline
  * bench). One JSON line per measurement; a final line carries the table
  * row counts per SF so exponents can be computed against the right
  * driver table. Post-processing (fit + table) lands in SCALE.md.
  *
  * Run: `runMain graft.tools.ScaleSweep [query names...]`. */
object ScaleSweep {

  /** The families worth sweeping: candidate-generation dedup, ANN
    * tiers, iterative graph/convergence loops, corpus-wide text/index
    * aggregations. Cheap single-pass relational queries are excluded —
    * their scans are trivially linear. */
  val DefaultQueries: Seq[String] = Seq(
    // dedup family (shingle/minhash/simhash candidates + CC resolution)
    "q_ngram_jaccard_pairs", "q_minhash_lsh_pairs", "q_simhash_pairs",
    "q_dedup_components_star", "q_dedup_cluster_sizes", "q_source_overlap",
    "q_substring_dups", "q_winnow_fingerprint",
    // similarity / ANN family
    "q_cosine_topk", "q_ann_lsh", "q_ann_ivf", "q_ann_ivfpq",
    "q_semdedup", "q_kmeans_converged", "q_knn_classify",
    // graph family (iterative, driver-sequenced rounds)
    "q_pagerank", "q_pagerank_converged", "q_lpa_communities",
    "q_kcore", "q_kcore_converged", "q_bfs_converged", "q_triangles",
    "q_ppr_seeds",
    // text / index family (corpus-wide)
    "q_bpe_train", "q_doc_sim_weighted", "q_tfidf_terms",
    "q_global_rank", "q_pack_chunks")

  def main(args: Array[String]): Unit = {
    // GRAFT_SWEEP_DIRS overrides the swept directories (comma-separated)
    // — used for the synthetic 5× octave (tools.MakeScale5x output)
    val sfs = sys.env.get("GRAFT_SWEEP_DIRS")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    for (d <- sfs) {
      for (t <- Seq("documents", "embeddings", "lineitem", "orders",
          "events")) {
        val n = graft.io.Tables.load(spark, d, t).count()
        println(s"""{"sweep_rows":"$t","sf":"$d","rows":$n}""")
      }
      for (q <- queries) {
        val f = fns.getOrElse(q,
          sys.error(s"unknown query $q — check the registry"))
        def run(): Boolean =
          try { f(spark, d).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[sweep] $q at $d failed: ${e.getMessage}")
            false
          }
        run(); run() // warm: codegen + footers, adjacent to timed runs
        val timed = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val ok = run()
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val (med, mn) =
          if (timed.forall(_._2)) {
            val ts = timed.map(_._1).sorted
            (ts(1), ts.head)
          } else (-1.0, -1.0)
        println(f"""{"sweep":"$q","sf":"$d","median":$med%.3f,"min":$mn%.3f}""")
      }
    }
    spark.stop()
  }
}
