package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextHash

/** The shingle document-frequency cap must restore linear candidate volume
  * when a boilerplate shingle appears in every document (the quadratic hot
  * key at web scale), without changing the score of any emitted pair. */
class DedupDfCapSpec extends SparkSpec {

  // 120 docs, each: 8 unique body tokens + a universal boilerplate phrase.
  // Docs 0 and 1 share the body except the final token — the one true
  // near-dup pair. Every other pair overlaps ONLY via boilerplate.
  private lazy val sh = {
    import spark.implicits._
    // shingle hashing calls the native graft_md5_mod31 — install the
    // session extras so this suite also passes in ISOLATION (in a full
    // run an earlier suite's Tables.load does it first)
    graft.io.Tables.ensureSessionRegistered(spark)
    val boiler = "all rights reserved by the example corporation"
    def body(i: Int) =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val docs = (0 until 120).map { i =>
      val b = if (i == 1) body(0).replace("theta0", "theta1x") else body(i)
      (i.toLong, s"$b $boiler")
    }
    TextHash.addShingleHashes(docs.toDF("doc_id", "text"), col("text"))
      .select("doc_id", "hs")
  }

  test("df-cap keeps candidate volume linear under a universal shingle") {
    val uncapped = Dedup.jaccardCandidates(sh, None).count()
    val capped = Dedup.jaccardCandidates(sh, Some(50L)).count()
    // boilerplate shingles (df=120) make every pair a candidate
    assert(uncapped >= 120L * 119 / 2, s"uncapped=$uncapped")
    // with df>50 shingles dropped, only genuinely-overlapping pairs remain
    assert(capped <= 10, s"capped=$capped")
  }

  test("hash helpers refuse an input that already uses the staging column") {
    import spark.implicits._
    val clash = Seq((1L, "a b c", 9L)).toDF("doc_id", "text", "__graft_th")
    // silently overwriting + dropping the caller's column would corrupt it
    intercept[IllegalArgumentException] {
      TextHash.addShingleHashes(clash, col("text"))
    }
    intercept[IllegalArgumentException] {
      TextHash.addWindowHashes(clash, col("text"), 2)
    }
  }

  test("capped star-CC resolves only the genuine near-dup cluster") {
    // the capped pair graph on the boilerplate corpus is exactly {(0,1)},
    // so resolution labels two nodes: 0 keeps itself, 1 hangs off 0 —
    // linear end to end where the uncapped path would CC a 120-clique
    val labels = Dedup.starComponents(
      Dedup.jaccardPairsFrom(sh, 0.5, Some(50L)).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(labels.toSet == Set((0L, 0L, true), (1L, 0L, false)))
  }

  test("capped resolution ≡ uncapped resolution when the cap doesn't bind") {
    // the sf corpus has no shingle past JacDfCap (pinned here), so the
    // registered q_dedup_resolve_capped must land value-exactly on the
    // uncapped q_dedup_components_star answer
    val byName = Dedup.all.map(q => q.name -> q).toMap
    val capped =
      byName("q_dedup_resolve_capped").fn(spark, sf001).collect().toSeq
    val uncapped =
      byName("q_dedup_components_star").fn(spark, sf001).collect().toSeq
    assert(capped.nonEmpty)
    assert(capped == uncapped)
    // and the DERIVED-cap resolution: the derivation keeps everything
    // on this corpus, so the whole autocap pipeline lands on the same
    // answer too
    val autocap =
      byName("q_dedup_resolve_autocap").fn(spark, sf001).collect().toSeq
    assert(autocap == uncapped,
      s"autocap resolution diverged: ${autocap.size} vs ${uncapped.size}")
  }

  test("derived cap is a corpus statistic: lands below the hot-df knee " +
    "on the boilerplate corpus, above 64 on a legit-df-100 corpus, " +
    "and no-op on the clean corpus") {
    import spark.implicits._
    // 1. hot-shingle fixture (this suite's 120-doc boilerplate corpus):
    //    the df=120 boilerplate levels blow the linear budget, so the
    //    derivation must land the cap BELOW them — and below the
    //    hardcoded 64 (the knee sits under 64 here; a constant cap of 64
    //    would quietly re-enter the quadratic regime)
    val hot = Dedup.dfCapStats(sh).head()
    assert(hot.getBoolean(6), s"hot corpus must flag capped: $hot")
    assert(hot.getLong(5) <= 64L,
      s"derived cap must sit below the hot-df knee (<= 64): $hot")
    assert(hot.getLong(2) == 120L, s"boilerplate df must be 120: $hot")
    // candidate volume under the derived cap is linear (within budget)
    val cand = Dedup.jaccardCandidates(sh, Some(hot.getLong(5))).count()
    assert(cand <= hot.getLong(4), s"cand=$cand budget=${hot.getLong(4)}")
    // 2. a corpus whose legitimate df ~100 phrase FITS the linear
    //    budget: 400 docs, 100 sharing one 4-word phrase (2 trigram
    //    shingles at df=100 → volume 2·100·99/2 = 9,900 ≤ 64·400).
    //    The derivation keeps it (cap ≥ 100 > 64) where the hardcoded
    //    64 would drop the phrase's candidates.
    def body(i: Int) =
      (1 to 8).map(w => s"t${i}w$w").mkString(" ")
    val legit = (0 until 400).map { i =>
      val phrase = if (i < 100) " shared phrase four words" else ""
      (i.toLong, body(i) + phrase)
    }.toDF("doc_id", "text")
    val lsh = TextHash.addShingleHashes(legit, col("text"))
      .select("doc_id", "hs")
    val ls = Dedup.dfCapStats(lsh).head()
    assert(!ls.getBoolean(6), s"legit df-100 corpus must not cap: $ls")
    assert(ls.getLong(5) >= 100L && ls.getLong(5) > 64L,
      s"derived cap must keep the legitimate df-100 level: $ls")
    assert(Dedup.jaccardCandidates(lsh, Some(ls.getLong(5))).count() >
      Dedup.jaccardCandidates(lsh, Some(64L)).count(),
      "the derived cap must keep candidates the hardcoded 64 drops")
    // 3. clean corpus: whole distribution fits → derived_cap = max_df,
    //    capped=false, and the autocap pairs are EXACTLY the uncapped set
    val byName = Dedup.all.map(q => q.name -> q).toMap
    val stat = byName("q_jaccard_capstat").fn(spark, sf001).head()
    assert(!stat.getBoolean(6) && stat.getLong(5) == stat.getLong(2),
      s"clean corpus must derive no-cap: $stat")
    val auto = byName("q_jaccard_pairs_autocap").fn(spark, sf001)
      .collect().toSeq
    val un = Dedup.jaccardPairsFrom(
      TextHash.addShingleHashes(
        graft.io.Tables.load(spark, sf001, "documents"), col("text"))
        .select("doc_id", "hs"), 0.8, None)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(auto.nonEmpty && auto == un,
      s"autocap must equal uncapped on the clean corpus: ${auto.size} vs ${un.size}")
  }

  test("capStatsFromDf survives a pair volume past Long.Max: the " +
    "decision arithmetic never wraps (ADVICE r12)") {
    import spark.implicits._
    // one hot level whose single-term volume 3·(2e9)·(2e9−1) ≈ 1.2e19
    // exceeds Long.Max ≈ 9.22e18: a plain long SUM wraps NEGATIVE, the
    // wrapped v2 "fits" any budget, and the derivation would hand back
    // the hot level itself as the cap — the exact failure the decimal
    // arithmetic exists to prevent. Correct answer: only df=1 fits
    // (volume 0), the hot tail is capped away.
    val hotDf = 2000000000L
    val dfIdx = (Seq.fill(10)(1L) ++ Seq.fill(3)(hotDf)).toDF("df")
    val nd = Seq(1000L).toDF("n_docs")
    val r = Dedup.capStatsFromDf(dfIdx, nd).head()
    assert(r.getLong(5) == 1L,
      s"derived_cap must land below the overflowing hot level: $r")
    assert(r.getBoolean(6), s"the hot tail must report capped: $r")
    // v_total = floor(3·hotDf·(hotDf−1)/2) ≈ 6.0e18 still fits BIGINT
    // and must be the exact integer half, not a double-rounded one
    val expect = (BigInt(3) * BigInt(hotDf) * BigInt(hotDf - 1) / 2)
    assert(BigInt(r.getLong(3)) == expect,
      s"v_total must be exact-integer: ${r.getLong(3)} vs $expect")
  }

  test("df-index fold: base + batch delta re-derives exactly the " +
    "from-scratch statistics, with a non-vacuous batch") {
    // q_capstat_update folds the batch's (h, df) delta into the
    // persisted df index; counts add under disjoint doc sets, so the
    // folded derivation must equal q_jaccard_capstat's from-scratch one
    // column-for-column — engine-to-engine, not just engine-to-oracle
    val byName = Dedup.all.map(q => q.name -> q).toMap
    val folded = byName("q_capstat_update").fn(spark, sf001).head()
    val scratch = byName("q_jaccard_capstat").fn(spark, sf001).head()
    (0 until 7).foreach(i => assert(folded.get(i) == scratch.get(i),
      s"folded derivation diverged at col $i: $folded vs $scratch"))
    assert(folded.getLong(7) > 0 && folded.getLong(8) > 0,
      s"the folded batch must be non-vacuous: $folded")
  }

  test("capped pairs verify against FULL sets: scores match uncapped") {
    val capped = Dedup.jaccardPairsFrom(sh, 0.5, Some(50L)).collect()
    assert(capped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    val uncapped = Dedup.jaccardPairsFrom(sh, 0.5, None).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // the cap lost no above-threshold pair here (overlap beyond
    // boilerplate survives), and every emitted score is bit-identical
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet
      == uncapped.keySet)
    capped.foreach { r =>
      assert(uncapped((r.getLong(0), r.getLong(1))) == r.getDouble(4))
    }
  }
}
