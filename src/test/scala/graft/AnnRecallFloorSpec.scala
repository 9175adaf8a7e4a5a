package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity

/** ABSOLUTE recall floors for every ANN tier (VERDICT r7 wrong #1 /
  * next #1): the oracle gate on `q_ann_recall` proves engine == oracle,
  * but both sides interpolate the SAME knob values, so a knob change
  * that degrades recall moves both together and that gate stays green.
  * This spec is the missing tripwire: at DEFAULT knobs, each tier's
  * hits@3 against the knob-INDEPENDENT exact ground truth (the brute
  * float-cosine scan, and its label-filtered variant for `filtered`)
  * must meet an exact pinned floor.
  *
  * The floors are the exact sf0.01 values measured at the r8 defaults
  * (Bands=4, PlanesPerBand=8, IvfCells=16, IvfProbe=2) — everything is
  * deterministic integer arithmetic, so `>=` with the exact value is a
  * tight floor that still permits future recall IMPROVEMENTS. A
  * deliberate degradation (e.g. GRAFT_IVF_NPROBE=1) drops ivf/filtered
  * hits below their floors and fails this spec even though the oracle
  * gate stays green (verified manually r8, NOTES.md).
  *
  * Absolute recall on this corpus is LOW for some tiers (ivfpq 2/30,
  * lsh 3/30): the synthetic vectors are near-uniform random, the
  * hardest possible ANN input (no cluster structure for IVF cells or
  * untrained PQ anchors to exploit). The floor's job is regression
  * detection, not quality certification — SURVEY/COVERAGE document the
  * tiers' expected behavior on real corpora. */
class AnnRecallFloorSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  /** Exact hits@3 per tier measured at sf0.01, default knobs, r8. */
  private val floors = Map(
    "filtered" -> 5L,
    "hard_neg" -> 8L,
    "int8" -> 18L,
    "ivf" -> 7L,
    "ivf_kmeans" -> 20L,
    "ivfpq" -> 2L,
    "lsh" -> 3L,
    "multiprobe" -> 15L)

  // Deliberately NO assume() on the knob env vars: the whole point is
  // that a knob setting (or default change) that degrades recall FAILS
  // here — a guard that cancels under set knobs would skip the tripwire
  // in exactly the scenario it exists for. Retuning knobs on purpose
  // means re-pinning these floors in the same change.
  test("each ANN tier's hits@3 meets its pinned floor at default knobs") {
    val rows = Similarity.qAnnRecall.fn(spark, sf01)
      .select("tier", "hits", "exact_k").collect()
    val hits = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits.keySet == floors.keySet,
      s"tier set drifted: ${hits.keySet} vs pinned ${floors.keySet}")
    floors.foreach { case (tier, floor) =>
      assert(hits(tier) >= floor,
        s"tier '$tier' recall regressed: hits ${hits(tier)} < floor $floor")
    }
    // the ground truth itself: 10 queries × top-3 per tier
    assert(rows.forall(_.getLong(2) == 30L))
  }
}
