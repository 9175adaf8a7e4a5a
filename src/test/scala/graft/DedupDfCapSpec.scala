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
