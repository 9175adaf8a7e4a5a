package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe for the STATISTICS-derived IVF sizing (r13, VERDICT r12 next
  * #3): per directory, the fixed-`GRAFT_IVF_CELLS` quantizer and the
  * derived ⌈n_vecs/target_occ⌉ one are built and served side by side,
  * measuring (a) index build seconds (via [[graft.plans.FrameMemo]]'s
  * build bill), (b) serve seconds for the top-3 probe query, and (c)
  * recall@3 against the exact brute-force top-3 — the numbers behind
  * SCALE.md's derived-cells trajectory table, mirroring the r12
  * derived-df-cap study's protocol (per-dir fresh sessions so every
  * rep rebuilds from cold; rep 1 discarded as codegen warmup).
  *
  * Run: `GRAFT_SWEEP_DIRS=dir1x[,dir5x,...] runMain
  * graft.tools.AnnCellsProbe`. */
object AnnCellsProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("GRAFT_SWEEP_DIRS")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(sys.error("set GRAFT_SWEEP_DIRS"))
    val reps = sys.env.get("GRAFT_PROBE_REPS").map(_.toInt).getOrElse(2)
    val root = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    root.sparkContext.setLogLevel("ERROR")
    val byName = graft.similarity.Similarity.all.map(q => q.name -> q).toMap
    for (d <- dirs; rep <- 1 to reps) {
      val s = root.newSession()
      graft.io.Tables.ensureSessionRegistered(s)
      // knob-independent exact ground truth: brute float-cosine top-3
      val exact = byName("q_cosine_topk").fn(s, d)
        .filter("rnk <= 3").select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def side(variant: String, q: String, tag: String): Unit = {
        val before = graft.plans.FrameMemo.buildTimes
        val t0 = System.nanoTime()
        val rows = byName(q).fn(s, d)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val coldSecs = (System.nanoTime() - t0) / 1e9
        val build = graft.plans.FrameMemo.buildTimes
          .get(s"$tag@$d").filterNot(before.get(s"$tag@$d").contains)
          .getOrElse(-1.0)
        val t1 = System.nanoTime()
        byName(q).fn(s, d).count() // serve off the built memo
        val serve = (System.nanoTime() - t1) / 1e9
        val hits = rows.count(exact.contains)
        if (rep > 1) // rep 1 per dir = codegen warmup, discarded
          println(f"""{"ann_cells":{"dir":"$d","variant":"$variant",""" +
            f""""build":$build%.3f,"serve":$serve%.3f,"cold":$coldSecs%.3f,""" +
            f""""hits":$hits,"exact_k":${exact.size}}}""")
      }
      side("fixed16", "q_ann_ivf", "ivfRanked")
      side("auto", "q_ann_ivf_auto", "ivfAssignAuto")
      side("auto_probe", "q_ann_ivf_probe_auto", "ivfAssignAuto")
      if (rep > 1) {
        val sim = graft.similarity.Similarity
        val n = graft.io.Tables.load(s, d, "embeddings").count()
        val c = sim.derivedCellsOf(n)
        val p = sim.derivedIvfProbe(s, d)
        // held-out generalization (r14): the derivation calibrates on
        // vec_id < 10; serve 10 DIFFERENT queries at the derived width
        // and score them against their own brute truth — the number
        // that makes the auto_probe tier's sample recall non-tautological
        val heldSql = "vec_id >= 10 AND vec_id < 20"
        val heldExact = sim.bruteTop3For(s, d, heldSql)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val heldRows = sim.ivfProbeAutoServeFor(s, d, heldSql)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val heldHits = heldRows.count(heldExact.contains)
        println(s"""{"ann_cells_derivation":{"dir":"$d","n_vecs":$n,""" +
          s""""derived_cells":$c,"derived_nprobe":$p,""" +
          s""""heldout_hits":$heldHits,"heldout_exact":${heldExact.size}}}""")
      }
      root.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }
}
