package graft

import graft.multimodal.{Multimodal, PngCodec}

/** Perceptual near-dup (dHash over decoded luma): the hash must catch a
  * re-encoded and a resized-re-encoded near-dup pair through the REAL
  * PNG round trip, keep unrelated images far, and the banded candidate
  * join must surface the planted pairs the registered gate emits. */
class ImageDhashSpec extends SparkSpec {

  private def ramp(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(j => ((j % w) * 3 + (j / w) * 2).toByte)

  private def hashOf(w: Int, h: Int, px: Array[Byte],
      filter: Int => Int, split: Int): Array[Long] = {
    val (dw, dh, dpx) = PngCodec.decodeGray8(
      PngCodec.encodeGray8(w, h, px, filter, split)).get
    assert(dw == w && dh == h)
    Multimodal.dhashBands(dw, dh, dpx)
  }

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) =>
      java.lang.Long.bitCount(x ^ y) }.sum

  test("a pure re-encode (different filter cycle and chunking) hashes " +
    "identically — PNG is lossless, so the verdict is exact") {
    val px = ramp(50, 40)
    val a = hashOf(50, 40, px, y => y % 5, 96)
    val b = hashOf(50, 40, px, y => (y + 3) % 5, 64)
    assert(hamming(a, b) == 0, "lossless re-encode must not move the hash")
  }

  test("a RESIZED re-encode of smooth content lands within the Hamming " +
    "radius AND shares a band key — the banded join catches it") {
    val (w, h) = (50, 40)
    val px = ramp(w, h)
    val orig = hashOf(w, h, px, y => y % 5, 96)
    val resized = Multimodal.resizeNearest(px, w, h, w + 3, h + 2)
    val variant = hashOf(w + 3, h + 2, resized, y => (y + 1) % 5, 64)
    val d = hamming(orig, variant)
    assert(d <= Multimodal.DhashHamming,
      s"resized near-dup drifted past the radius: hamming $d")
    assert(orig.zip(variant).exists { case (a, b) => a == b },
      "the pair must share an exact band key to be a candidate")
  }

  test("a uniform brightness shift does not move the hash (gradient " +
    "comparisons are photometric-shift invariant below the clamp)") {
    // the r14 sweep's measured row, pinned: dHash compares adjacent
    // box MEANS with strict >, so adding a constant to every pixel
    // moves both operands equally — only the 255 clamp can flatten a
    // gradient, and this ramp stays below it at +16/+48
    val (w, h) = (50, 40)
    val px = ramp(w, h)
    val orig = hashOf(w, h, px, y => y % 5, 96)
    for (d <- Seq(16, 48)) {
      val shifted = px.map(v => math.min(255, (v & 0xff) + d).toByte)
      val b = hashOf(w, h, shifted, y => (y + 1) % 5, 64)
      assert(hamming(orig, b) == 0,
        s"brightness +$d moved the hash: ${hamming(orig, b)}")
    }
  }

  test("unrelated images land far apart") {
    val a = hashOf(50, 40, ramp(50, 40), y => y % 5, 96)
    // reversed ramp: opposite gradient direction everywhere
    val px = ramp(50, 40).reverse
    val b = hashOf(50, 40, px, y => y % 5, 96)
    assert(hamming(a, b) > Multimodal.DhashHamming,
      s"opposite-gradient images must not be near-dups: ${hamming(a, b)}")
  }

  test("the registered gate emits the planted resized variants (banded " +
    "candidates -> exact verdicts) and every verdict is within radius") {
    val rows = Multimodal.qImageDhashPairs.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val planted = rows.filter(r =>
      r.getLong(0) == r.getLong(2) && r.getLong(3) == 1L)
    assert(planted.nonEmpty,
      "at least some original<->own-variant pairs must be caught")
    assert(rows.forall(_.getLong(4) <= Multimodal.DhashHamming))
    // banding economics, stated not hidden: 4 16-bit bands GUARANTEE
    // candidates only at radius <= 3 (Manku-style trade); the planted
    // resize severity sits at Hamming ~1-7, so a strict majority but
    // not all 50 variants surface. The count pins the measured recall
    // so a silent banding regression (or an accidental all-pairs join)
    // moves a spec, not just a bench number.
    assert(planted.length >= 20 && planted.length <= 50,
      s"banded recall moved: ${planted.length} planted pairs")
  }

  test("resolution: every caught variant lands in its original's " +
    "component, and the kept representative is always an original") {
    val pairs = Multimodal.qImageDhashPairs.fn(spark, sf001).collect()
    val resolved = Multimodal.qImageDedupResolve.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)), r.getBoolean(4))).toMap
    assert(resolved.nonEmpty)
    // component representatives are minimum img_ids: an orig+variant
    // cluster keeps the original (even img_id beats odd)
    resolved.foreach { case (img, (comp, kept)) =>
      assert(kept == (img == comp), s"$img kept=$kept comp=$comp")
    }
    // a caught (orig, own-variant) pair must resolve into one component
    pairs.filter(r => r.getLong(0) == r.getLong(2) && r.getLong(3) == 1L)
      .foreach { r =>
        val doc = r.getLong(0)
        assert(resolved((doc, 0L))._1 == resolved((doc, 1L))._1,
          s"doc $doc's variant resolved apart from its original")
        assert(!resolved((doc, 1L))._2, s"doc $doc's variant was kept")
      }
  }

  test("delta screen catches every pair-gate verdict and never beats " +
    "the planted pair's distance") {
    // every verified (original, variant) pair the PAIR gate emits with
    // the variant side, keyed by the variant's doc — the delta screen
    // must catch at least these (its candidates are a superset
    // restricted to the original side)
    val pairRows = Multimodal.qImageDhashPairs.fn(spark, sf001).collect()
    val ownHam = pairRows
      .filter(r => r.getLong(0) == r.getLong(2) && r.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val verdicts = Multimodal.qImageDedupDelta.fn(spark, sf001).collect()
    assert(verdicts.length == 50) // doc_id % 10 == 4 slice at sf0.001
    verdicts.foreach { r =>
      val (doc, dup) = (r.getLong(0), r.getBoolean(3))
      ownHam.get(doc).foreach { own =>
        assert(dup, s"doc $doc's caught pair missing from the delta")
        // the best match is at least as close as the planted pair —
        // usually the own original, but the corpus has NATURAL
        // cross-doc near-dups (near-identical texts → near-identical
        // block bitmaps), so a closer indexed original may win
        assert(r.getLong(2) <= own,
          s"doc $doc best_hamming ${r.getLong(2)} worse than own $own")
      }
      if (dup) assert(!r.isNullAt(1) && r.getLong(2) <=
        Multimodal.DhashHamming)
    }
    assert(verdicts.count(_.getBoolean(3)) >= 20)
    // most caught variants still name their own original
    val ownBest = verdicts.count(r =>
      r.getBoolean(3) && r.getLong(1) == r.getLong(0))
    assert(ownBest >= verdicts.count(_.getBoolean(3)) / 2)
  }

  test("index fold: a batch-2 image near a batch-1 SURVIVOR is caught " +
    "from the fold; near a batch-1 REJECT it is not (rejects never " +
    "enter the index)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // synthetic hash corpus, band keys chosen for exact control:
    //   O1=100 original (1,1,1,1)
    //   X=501 batch-1 survivor (5,5,5,5): shares no band with O1
    //   X2=503 batch-1 REJECT (1,1,1,3): hamming 1 from O1
    //   Y=601 batch-2, (5,5,5,13): shares bands 0-2 with X, hamming 1
    //   Y2=603 batch-2, (9,9,9,3): shares ONLY band3 with X2 (key 3),
    //          nothing with any original
    //   W=605 batch-2, (1,1,1,1): exact copy of O1
    val hashes = Seq(
      (100L, 50L, 0, 1L, 1L, 1L, 1L),
      (501L, 250L, 1, 5L, 5L, 5L, 5L),
      (503L, 251L, 1, 1L, 1L, 1L, 3L),
      (601L, 300L, 1, 5L, 5L, 5L, 13L),
      (603L, 301L, 1, 9L, 9L, 9L, 3L),
      (605L, 302L, 1, 1L, 1L, 1L, 1L))
      .toDF("img_id", "doc_id", "variant", "b0", "b1", "b2", "b3")
    val isB1 = col("img_id").isin(501L, 503L)
    val isB2 = col("img_id").isin(601L, 603L, 605L)
    val v = Multimodal.imgIndexUpdateOf(hashes, isB1, isB2).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
      .toMap
    assert(v(601L) == (Some(501L), true),
      s"batch-2 near a folded SURVIVOR must be caught from it: ${v(601L)}")
    assert(v(603L) == (None, false),
      s"batch-2 near a batch-1 REJECT must not match: ${v(603L)}")
    assert(v(605L) == (Some(100L), true),
      s"batch-2 copy of an original must match it: ${v(605L)}")
  }
}
