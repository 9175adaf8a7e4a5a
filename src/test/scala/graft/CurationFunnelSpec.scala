package graft

import graft.dedup.Dedup

/** The end-to-end funnel's verdict branches, exercised with real data:
  * the sf0.01 oracle gate proves value-exactness but its corpus has no
  * identical texts, so the exact_dup branch only fires at sf0.1 (8 md5
  * duplicates). This spec pins that every reason is reachable and that
  * precedence holds (an exact dup that is also in a near-dup cluster
  * reports exact_dup). */
class CurationFunnelSpec extends SparkSpec {

  test("all five verdict reasons are reachable and partition the corpus") {
    val rows = Dedup.qCurationFunnel.fn(spark, "/root/testdata/sf0.1")
      .collect()
    assert(rows.length == 5000)
    val byReason = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(byReason.keySet.subsetOf(Set("benchmark", "exact_dup",
      "near_dup", "contaminated", "kept")), byReason.toMap)
    // benchmark slice is exactly the doc_id % 50 == 0 rows
    assert(byReason("benchmark") == 100, byReason.toMap)
    // the sf0.1 corpus has 8 identical-text pairs: at least one loser
    // must surface as exact_dup (those not shadowed by benchmark)
    assert(byReason.getOrElse("exact_dup", 0) >= 1, byReason.toMap)
    assert(byReason.getOrElse("near_dup", 0) >= 1, byReason.toMap)
    assert(byReason.getOrElse("contaminated", 0) >= 1, byReason.toMap)
    assert(byReason.getOrElse("kept", 0) >= 1, byReason.toMap)
    // is_kept is exactly reason == 'kept'
    assert(rows.forall(r => r.getBoolean(2) == (r.getString(1) == "kept")))
  }

  /** Where the independent-stage and sequential-domain funnels disagree
    * (r9, VERDICT r8 wrong #3). Exact-dup removal alone can NEVER
    * change the near-dup verdicts of survivors — the kept copy has
    * identical text, so every pair and every keep-best comparison the
    * removed copy participated in survives through its keeper. All
    * disagreement therefore flows through BENCHMARK coupling: the
    * sequential funnel pulls benchmark docs out before clustering,
    * while the independent funnel lets them sit inside clusters (where
    * they can be the longest member) and inside the md5 keeper windows.
    * Consequently the sequential funnel only ever RELAXES a verdict —
    * a doc it removes lost to a survivor that also beats it in the
    * independent funnel's superset cluster — never tightens one.
    *
    * At sf0.1 the measured disagreement is exactly 7 docs, every one
    * near_dup(independent) → contaminated(sequential): their cluster's
    * longest member was a benchmark doc, so sequentially they win their
    * benchmark-free cluster and fall through to the contamination
    * stage (which flags them — they near-dup a benchmark doc, so their
    * shingles overlap the eval slice by construction). */
  test("sequential twin disagrees only by relaxing, via benchmark" +
      " coupling (7 docs at sf0.1)") {
    val ind = Dedup.qCurationFunnel.fn(spark, "/root/testdata/sf0.1")
      .select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seq = Dedup.qCurationFunnelSeq.fn(spark, "/root/testdata/sf0.1")
      .select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ind.keySet == seq.keySet)
    val disagree = ind.keySet.filter(id => ind(id) != seq(id))
    assert(disagree == Set(48L, 619L, 3017L, 3701L, 4153L, 4542L, 4743L),
      s"disagreement set drifted: $disagree")
    disagree.foreach { id =>
      assert(ind(id) == "near_dup" && seq(id) == "contaminated",
        s"doc $id: ${ind(id)} -> ${seq(id)}")
    }
    // the relax-only invariant over the whole corpus: the sequential
    // verdict is never more severe than the independent one
    // (benchmark rows agree by construction — same doc_id % 50 test)
    val severity = Map("benchmark" -> 4, "exact_dup" -> 3,
      "near_dup" -> 2, "contaminated" -> 1, "kept" -> 0)
    assert(ind.keySet.forall(id => severity(seq(id)) <= severity(ind(id))))
  }
}
