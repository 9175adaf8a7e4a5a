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
}
