package graft.tools

import org.apache.spark.sql.SparkSession

/** Build-cost octave (VERDICT r10 next #4): `memo_builds` bills every
  * session-memoized index's one-shot build at ONE scale factor; this
  * tool measures those builds at the encoder-parity 1×/5× pair
  * (tools.MakeScale5x output) so each build's scaling exponent is
  * measured, not assumed. The pair-join builds (`jacPairs08`, `simWt`,
  * `edgesWithDeg`, `lpaLabels`) are where a super-linear α would hurt
  * most at 100 TB — a candidate join whose build grows quadratically
  * dominates the whole ingest bill long before serving does.
  *
  * Protocol: per directory, REPS fresh `newSession()`s (FrameMemo is
  * keyed by session instance, so each rep rebuilds every memo from
  * cold); per rep, one trigger query per memo family runs to
  * completion, then the rep snapshots `FrameMemo.buildTimes` for keys
  * under that directory. Per (tag, dir) the reported time is the MIN
  * across reps — same-machine de-jitter, the SCALE.md sub-second-octave
  * rule — with rep 1 of each dir discarded as the session's codegen
  * warmup (builds share compiled plans across sessions but not
  * checkpointed blocks). Output: one JSON line per (dir, tag, secs),
  * post-processed into SCALE.md's build-octave table.
  *
  * Run: `GRAFT_SWEEP_DIRS=/tmp/graft_sf1x,/tmp/graft_sf5x \
  *   runMain graft.tools.BuildOctave`. */
object BuildOctave {

  /** One trigger per memo family — each consumer query forces its
    * builds inside the rep's session. Queries chosen as the CHEAPEST
    * consumer of each tag so the rep's cost is dominated by the builds
    * themselves. */
  val Triggers: Seq[String] = Seq(
    "q_dedup_components_star", // shingleSets -> jacPairs08 -> starComps08
    "q_dedup_resolve_capped", // jacPairsCap64 -> starCompsCap64
    "q_jaccard_capstat", // jacCapStat (df pre-pass)
    "q_jaccard_pairs_autocap", // jacPairsAuto (pairs under the derived cap)
    "q_dedup_resolve_autocap", // starCompsAuto (CC over the autocap pairs)
    "q_ann_ivf_auto", // ivfAssignAuto (the statistics-sized IVF index)
    "q_ann_probe_auto", // annProbeTruth + annProbeRank (nprobe calibration)
    "q_image_dedup_resolve", // imgHashes -> imgDhashPairs -> imgDhashComps
    "q_image_index_update", // imgBandsIncr1 (the image-index fold)
    "q_dedup_reband", // bandsReband
    "q_dedup_lifecycle", // bandsLifecycle (fold -> 2x8 retune -> fold)
    "q_ann_lifecycle", // ivfLifecycle (prefix-trained retrain mid-chain)
    "q_minhash_lsh_pairs", // docBands
    "q_doc_sim_weighted", // simWt (+ termFreq-family posting index)
    "q_tfidf_terms", // termFreq
    "q_pagerank", // symEdges -> edgesWithDeg
    "q_lpa_communities", // lpaLabels
    "q_ann_lsh", // banded
    "q_ann_ivf", // int8Codes -> ivfRanked
    "q_dedup_index_update", // bandsIncr1
    "q_dedup_index_update3", // bandsIncr3_1, bandsIncr3_2
    "q_ann_index_update", // ivfIncr1
    "q_ann_index_update3", // ivfIncr3_1, ivfIncr3_2
    "q_ann_ivf_retrain", // ivfRetrain
    "q_exact_quantiles", // rankedCentsGlobal
    "q_group_quantiles") // rankedPrioCents

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.get("GRAFT_SWEEP_DIRS")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
      .getOrElse(sys.error("set GRAFT_SWEEP_DIRS=dir1x,dir5x"))
    val reps = sys.env.get("GRAFT_BUILD_REPS").map(_.toInt).getOrElse(4)
    // optional trigger subset (comma-separated query names): the 25×
    // octave re-runs only the families under study — the uncapped pair
    // build alone costs ~140 s per rep there, and paying it to refresh
    // an already-measured row would be waste, not rigor
    val triggers = sys.env.get("GRAFT_BUILD_TRIGGERS")
      .map { t =>
        // fail loudly on a typo or stale name (ADVICE r12): a silently
        // filtered subset would "measure" an octave of nothing
        val req = t.split(',').toSeq.filter(_.nonEmpty)
        val unknown = req.filterNot(Triggers.toSet)
        if (unknown.nonEmpty) sys.error(
          s"GRAFT_BUILD_TRIGGERS names not in Triggers: " +
            s"${unknown.mkString(", ")} (known: ${Triggers.mkString(", ")})")
        Triggers.filter(req.toSet)
      }
      .getOrElse(Triggers)
    val root = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    root.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    val best = scala.collection.mutable.Map[(String, String), Double]()
    for (d <- dirs; r <- 1 to reps) {
      val s = root.newSession()
      // buildTimes is JVM-global and keyed tag@dir, so a trigger that
      // FAILS this rep leaves the previous rep's value (possibly the
      // discarded warmup's) under its tags — snapshot before the rep and
      // merge only tags whose value CHANGED, i.e. builds that actually
      // ran in this rep
      val before = graft.plans.FrameMemo.buildTimes
      triggers.foreach { q =>
        try fns(q)(s, d).count()
        catch { case e: Throwable =>
          System.err.println(s"[build-octave] $q at $d: ${e.getMessage}")
        }
      }
      val snap = graft.plans.FrameMemo.buildTimes
        .collect { case (k, v) if k.endsWith(s"@$d")
            && !before.get(k).contains(v) =>
          k.stripSuffix(s"@$d") -> v }
      // rep 1 per dir is the codegen warmup; later reps compete on min
      if (r > 1) snap.foreach { case (tag, secs) =>
        val key = (d, tag)
        if (!best.contains(key) || secs < best(key)) best(key) = secs
      }
      println(s"""{"build_rep":{"dir":"$d","rep":$r,"tags":${snap.size}}}""")
      // the rep's session is abandoned but its localCheckpointed memo
      // blocks live in the SHARED context's block manager — drop them
      // all (each rep rebuilds from cold anyway) or large corpora OOM
      // the heap by rep 2
      root.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    best.toSeq.sortBy { case ((d, t), _) => (t, d) }
      .foreach { case ((d, tag), secs) =>
        println(f"""{"build":{"dir":"$d","tag":"$tag","secs":$secs%.3f}}""")
      }
  }
}
