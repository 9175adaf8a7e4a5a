package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextOps

/** LLM-pipeline operators over the sf0.001 fixtures. The DuckDB oracle is
  * the value-exact gate; these specs assert semantic invariants. */
class PipelineOpsSpec extends SparkSpec {

  test("ngram jaccard: pairs are symmetric-free, jaccard in (0,1]") {
    val rows = Dedup.qNgramJaccardPairs.fn(spark, sf001).collect()
    assert(rows.nonEmpty) // generator plants near-dups
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r =>
      val j = r.getDouble(4); j >= 0.6 && j <= 1.0
    })
    // inter <= union
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("minhash LSH candidates are a subset of exact-jaccard >= 0.8 pairs") {
    val exact = Dedup.qNgramJaccardPairs.fn(spark, sf001)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.qMinhashLsh.fn(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty)
    // banding recall at jaccard >= 0.8 should be high
    assert(lsh.size >= (exact.size * 0.8).toInt)
  }

  test("delta dedup: verdicts agree with the whole-corpus pair set") {
    val rows = Dedup.qDedupDelta.fn(spark, sf001).collect()
    // covers the whole batch, batch docs only
    assert(rows.nonEmpty && rows.forall(_.getLong(0) % 10 == 0))
    // whole-corpus ground truth: exact-jaccard >= 0.8 pairs that CROSS
    // the batch/base split, keyed by batch doc
    val cross = Dedup.qNgramJaccardPairs.fn(spark, sf001)
      .filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        Seq(a -> b, b -> a).filter(p => p._1 % 10 == 0 && p._2 % 10 != 0)
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        // a flagged doc's best match must be a real cross-split pair,
        // from the base side, and is_dup must say so
        assert(cross.getOrElse(r.getLong(0), Set.empty)(r.getLong(1)),
          s"${r.getLong(0)} -> ${r.getLong(1)} not a true cross pair")
        assert(r.getLong(1) % 10 != 0 && r.getBoolean(3))
      } else assert(!r.getBoolean(3))
    }
    // the fixture plants near-dups across the split; LSH recall at >= 0.8
    // is high, so the delta must actually flag some of them
    val flagged = rows.count(_.getBoolean(3))
    assert(flagged > 0 && flagged >= (cross.size * 0.8).toInt,
      s"flagged $flagged of ${cross.size} true cross-split dups")
  }

  test("index update: batch-1 survivors join the index; rejected docs " +
    "do not") {
    // synthetic two-batch corpus exercising BOTH maintenance properties:
    //   A (id 1)  base
    //   B (id 10) batch 1, novel            -> admitted, folded in
    //   D (id 20) batch 1, near-copy of A   -> rejected, NOT folded in
    //   C (id 5)  batch 2, near-copy of B   -> must match the SURVIVOR B
    //   E (id 15) batch 2, EXACT copy of D  -> must match base A (j<1),
    //             never D (j=1.0) — rejected docs are invisible
    //   F (id 25) batch 2, novel            -> admitted
    import spark.implicits._
    def txt(p: String) = (1 to 50).map(i => s"$p$i").mkString(" ")
    def mut(p: String) = ((1 to 49).map(i => s"$p$i") :+ "zz").mkString(" ")
    val docsDf = Seq(1L -> txt("w"), 10L -> txt("v"), 20L -> mut("w"),
      5L -> mut("v"), 15L -> mut("w"), 25L -> txt("q"))
      .toDF("doc_id", "text")
    val sh = graft.functions.TextHash
      .addShingleHashes(docsDf, col("text")).select("doc_id", "hs")
    val bands = Dedup.lshBands(sh).select("doc_id", "band", "key")
    val inB1 = col("doc_id") % 10 === 0
    val inB2 = col("doc_id") % 10 === 5
    val isBase = !inB1 && !inB2
    val v1 = Dedup.screenBatch(docsDf.filter(inB1), bands.filter(inB1),
      bands.filter(isBase), sh.filter(inB1), sh).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(v1(20L).getBoolean(3) && v1(20L).getLong(1) == 1L,
      s"D must be rejected against base A: ${v1(20L)}")
    assert(!v1(10L).getBoolean(3), s"novel B must survive: ${v1(10L)}")
    // the fold: append ONLY the survivors' bands (same union shape as
    // qDedupIndexUpdate's memo build, survivors taken from v1's verdicts)
    val survivors = v1.values.filter(!_.getBoolean(3))
      .map(_.getLong(0)).toSeq.toDF("doc_id")
    val updated = bands.filter(isBase)
      .unionByName(bands.join(survivors, Seq("doc_id"), "left_semi"))
    val v2 = Dedup.screenBatch(docsDf.filter(inB2), bands.filter(inB2),
      updated, sh.filter(inB2), sh).collect()
      .map(r => r.getLong(0) -> r).toMap
    // C is caught BY THE FOLDED SURVIVOR — the property the operator adds
    assert(v2(5L).getBoolean(3) && v2(5L).getLong(1) == 10L,
      s"C must match folded survivor B: ${v2(5L)}")
    // E (exact copy of rejected D) matches base A at j < 1.0; a naive
    // fold of ALL of batch 1 would have matched D at j = 1.0 instead
    assert(v2(15L).getBoolean(3) && v2(15L).getLong(1) == 1L,
      s"E must match base A, never rejected D: ${v2(15L)}")
    assert(v2(15L).getDouble(2) < 1.0)
    assert(!v2(25L).getBoolean(3), s"novel F must be admitted: ${v2(25L)}")
  }

  test("train order: per-epoch permutations, contiguous shard positions") {
    val rows = TextOps.qTrainOrder.fn(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = rows.map(_._4).distinct.length
    // each doc appears exactly once per epoch
    assert(rows.length == 2 * nDocs)
    (0 to 1).foreach { e =>
      val ep = rows.filter(_._1 == e)
      assert(ep.map(_._4).distinct.length == nDocs)
      // positions are 1..n within every shard — a permutation, no gaps
      ep.groupBy(_._2).values.foreach { sh =>
        assert(sh.map(_._3).sorted.sameElements(1L to sh.length))
      }
    }
    // the two epochs are DIFFERENT permutations (that's the point)
    val place = rows.groupBy(_._4).view
      .mapValues(_.sortBy(_._1).map(t => (t._2, t._3))).toMap
    assert(place.values.count(v => v.head != v.last) > nDocs / 2)
  }

  test("simhash: near-dup pairs have much smaller hamming than random") {
    val sims = Dedup.qSimhashDocs.fn(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = Dedup.qNgramJaccardPairs.fn(spark, sf001)
      .filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.nonEmpty)
    def ham(p: (Long, Long)) =
      java.lang.Long.bitCount(sims(p._1) ^ sims(p._2))
    val nearHam = near.toSeq.map(ham)
    val ids = sims.keys.toSeq.sorted.take(60)
    val randHam = (for {
      i <- ids; j <- ids if i < j && !near((i, j))
    } yield ham((i, j)))
    // separation: worst near-dup pair below the random-pair median
    assert(nearHam.max <= 10)
    assert(nearHam.max < randHam.sorted.apply(randHam.size / 2))
  }

  test("wide simhash separates sharper: random pairs center near 31 bits") {
    val sims = Dedup.qSimhashWideDocs.fn(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = Dedup.qNgramJaccardPairs.fn(spark, sf001)
      .filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.nonEmpty)
    def ham(p: (Long, Long)) =
      java.lang.Long.bitCount(sims(p._1) ^ sims(p._2))
    val nearHam = near.toSeq.map(ham)
    val ids = sims.keys.toSeq.sorted.take(60)
    val randHam = (for {
      i <- ids; j <- ids if i < j && !near((i, j))
    } yield ham((i, j))).sorted
    // near-dups stay within the ≤5-of-62 threshold's neighbourhood while
    // unrelated pairs center near 62/2 — a wider gap than 32 bits allows
    assert(nearHam.max <= 12, nearHam.max)
    val randMedian = randHam(randHam.size / 2)
    assert(randMedian >= 20 && randMedian <= 42, randMedian)
    assert(nearHam.max < randMedian)
  }

  test("cosine top-k: ranks are 1..5 per query, cos within [-1,1]") {
    val rows = Similarity.qCosineTopk.fn(spark, sf001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to 5L))
      assert(rs.forall(r => math.abs(r.getDouble(3)) <= 1.000001))
    }
  }

  test("IVF index update: incremental append serves the from-scratch " +
    "answer") {
    // with anchors fixed, per-vector assignment is batching-invariant:
    // base-slice + fresh batch assignment unioned (q_ann_index_update's
    // memoized fold) must serve EXACTLY what the from-scratch index
    // (q_ann_ivf) serves — IVF's append-only invariant, pinned here so
    // a fold that dropped/duplicated cells fails the build
    val incr = Similarity.qAnnIndexUpdate.fn(spark, sf001).collect()
    val scratch = Similarity.qAnnIvf.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr.nonEmpty && incr.length == scratch.size)
    incr.foreach { r =>
      assert(scratch((r.getLong(0), r.getLong(1), r.getLong(2))), r)
      // is_new marks exactly the batch membership rule
      val nb = r.getLong(1)
      val expected = nb % 10 == 7 && nb >= 10 &&
        !(nb >= 100 && nb < 100 + Similarity.IvfCells)
      assert(r.getBoolean(4) == expected, r)
    }
  }

  test("LSH ANN results appear in the brute-force ranking of same query") {
    val brute = Similarity.qCosineTopk.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.qAnnLsh.fn(spark, sf001).collect()
    // every ANN rank-1 hit with cos close to 1 should be brute-force top-5
    val top1 = ann.filter(r => r.getLong(2) == 1 && r.getDouble(3) > 0.99)
    top1.foreach { r =>
      assert(brute.contains((r.getLong(0), r.getLong(1))))
    }
  }

  test("text stats: n_chars column matches recomputation") {
    val bad = TextOps.qTextStats.fn(spark, sf001)
      .filter(col("n_chars") =!= col("n_chars_calc"))
    assert(bad.count() == 0)
  }

  test("quality score is the mean of its four components") {
    val rows = TextOps.qQualityScore.fn(spark, sf001).collect()
    rows.foreach { r =>
      val parts = (1 to 4).map(r.getInt).sum
      assert(math.abs(r.getDouble(5) - parts / 4.0) < 1e-12)
    }
  }

  test("multimodal: byte-stats features via mapPartitions are " +
    "deterministic") {
    val a = Multimodal.qMultimodalFeatures.fn(spark, sf001).collect()
    val b = Multimodal.qMultimodalFeatures.fn(spark, sf001).collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Long]("checksum") < 997))
    // frame sampling slices cover the payload head
    val frames = Multimodal.sampleFrames(
      Array.tabulate[Byte](100)(_.toByte), frameSize = 10, stride = 2)
    assert(frames.length == 5 && frames.head.length == 10)
  }

  test("decodeAny dispatches on real container signatures, not mime") {
    // a GIF payload labeled text/plain must still decode as GIF: the
    // checksum covers DECODED frame pixels, which differ from raw-byte
    // stats because the container adds headers/LZW framing
    val px = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val gif = graft.multimodal.GifCodec.encodeGray8Frames(8, 8, Seq(px))
    val viaDispatch = Multimodal.decodeAny(
      Multimodal.MediaRow(1L, "text/plain", gif))
    assert(viaDispatch.checksum ==
      px.map(_.toLong & 0xff).sum % 997L)
    assert(viaDispatch.n_bytes == gif.length.toLong)
    // and a non-container payload takes the byte-stats fallback exactly
    val txt = "hello world".getBytes("UTF-8")
    val fb = Multimodal.decodeAny(Multimodal.MediaRow(2L, "text/plain", txt))
    assert(fb == Multimodal.byteStats(
      Multimodal.MediaRow(2L, "text/plain", txt)))
  }

  test("JL projection preserves query-pair distances within loose bounds") {
    // the statistical JL property the oracle can't gate (it's a bound,
    // not an equality): for the query slice, squared distances in the
    // 16-dim projection, rescaled by Dim/JlDim, stay within a small
    // constant factor of the 64-dim originals
    val vs = Similarity.qCosineTopk.fn(spark, sf001) // warm table load
    val e = graft.io.Tables.load(spark, sf001, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(e.size == 10)
    def proj(v: Array[Double]): Array[Double] =
      Similarity.jlWeights.map(w =>
        w.zip(v).map { case (a, b) => a * b }.sum).toArray
    // unnormalized ±1 rows: E‖Wa − Wb‖² = k·‖a−b‖², so rescale by 1/k
    // (the classic JL map is (1/√k)·W)
    val scale = 1.0 / Similarity.JlDim
    val ratios = for {
      a <- e.keys.toSeq.sorted; b <- e.keys.toSeq.sorted if a < b
    } yield {
      val d0 = e(a).zip(e(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val pa = proj(e(a)); val pb = proj(e(b))
      val d1 = pa.zip(pb).map { case (x, y) => (x - y) * (x - y) }.sum
      d1 * scale / d0
    }
    assert(ratios.size == 45)
    // ±1 projections at k=16: distortion concentrated around 1
    assert(ratios.forall(r => r > 0.25 && r < 4.0), ratios.min -> ratios.max)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, mean)
  }

  test("bpe training matches a plain-Scala reference, incl. the adjacent-repeat rule") {
    // reference implementation of the PINNED semantics: argmax by
    // (count desc, lhs, rhs), then ONE leftmost non-overlapping replace
    // of " lhs rhs " over the space-wrapped text per round
    def train(docs0: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
      var ds = docs0.map(t => s" $t ")
      (1 to rounds).map { r =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        ds.foreach { t =>
          val w = t.trim.split(" ")
          (0 until w.length - 1).foreach(i =>
            counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1)
        }
        val ((l, rr), c) = counts.toSeq.minBy { case ((l, rr), c) => (-c, l, rr) }
        ds = ds.map(_.replace(s" $l $rr ", s" $l+$rr "))
        (r, l, rr, c)
      }
    }
    import spark.implicits._
    // tiny corpus with a planted adjacent-repeat run ("x x x x") so the
    // single-pass rule (first occurrence only per round) is exercised
    val corpus = Seq("x x x x y", "x x y z", "a b a b", "a b c", "q")
    corpus.toDF("text").createOrReplaceTempView("bpe_tiny")
    var t = spark.table("bpe_tiny")
      .select(concat(lit(" "), col("text"), lit(" ")).as("t"))
    // run the engine's loop body against the tiny view via the public
    // query on a scratch dir is not possible (it reads `documents`), so
    // mirror the exact program inline at rounds=3
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to 3) {
      val top = t.select(split(trim(col("t")), " ").as("w"))
        .filter(size(col("w")) > 1)
        .select(explode(expr("transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS lhs, w[i + 1] AS rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(count(lit(1)).cast("long").as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect()(0)
      val (lw, rw, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, lw, rw, c))
      t = t.select(call_function("replace", col("t"),
        lit(s" $lw $rw "), lit(s" $lw+$rw ")).as("t"))
    }
    assert(merges.result() == train(corpus, 3))
    // and the corpus-scale query emits exactly BpeRounds ranked rows with
    // positive, non-increasing-only-by-merge counts
    val rows = TextOps.qBpeTrain.fn(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to TextOps.BpeRounds))
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("reband retune: 2x8 candidates nest inside 4x4, exact copies " +
    "stay caught, verdicts only tighten") {
    // the retune's POINT is occupancy control: a band key of 8 minhashes
    // collides at s^8, so every 2x8 candidate pair is a 4x4 candidate
    // pair by construction (band b of 2x8 = bands 2b,2b+1 of 4x4 both
    // colliding) and the candidate set can only THIN. Pin that nesting
    // on the real corpus, and the admission consequences on a fixture.
    import spark.implicits._
    val docsDf = graft.io.Tables.load(spark, sf001, "documents")
    val sh = graft.functions.TextHash
      .addShingleHashes(docsDf, col("text")).select("doc_id", "hs")
    val isBatch = col("doc_id") % 10 === 7
    def candPairs(bands: Int, r: Int): Set[(Long, Long)] = {
      val b = Dedup.lshBandsWith(sh, bands, r).select("doc_id", "band", "key")
      b.filter(!isBatch).as("o")
        .join(b.filter(isBatch).as("n"),
          col("n.band") === col("o.band") && col("n.key") === col("o.key"))
        .select(col("n.doc_id").as("a"), col("o.doc_id").as("b"))
        .distinct().collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val c44 = candPairs(4, 4)
    val c28 = candPairs(2, 8)
    assert(c28.subsetOf(c44),
      s"2x8 produced ${c28.diff(c44).size} pairs outside the 4x4 set")
    assert(c28.size <= c44.size)
    // fixture: exact copy always caught at ANY banding; novel never;
    // reband is_dup set nests inside the 4x4 set
    def txt(p: String) = (1 to 50).map(i => s"$p$i").mkString(" ")
    val fix = Seq(1L -> txt("w"), 2L -> txt("u"),
      7L -> txt("w"), 17L -> txt("q")).toDF("doc_id", "text")
    val fsh = graft.functions.TextHash
      .addShingleHashes(fix, col("text")).select("doc_id", "hs")
    def screenAt(bands: Int, r: Int): Map[Long, org.apache.spark.sql.Row] = {
      val fb = Dedup.lshBandsWith(fsh, bands, r).select("doc_id", "band", "key")
      Dedup.screenBatch(fix.filter(isBatch), fb.filter(isBatch),
        fb.filter(!isBatch), fsh.filter(isBatch), fsh)
        .collect().map(r0 => r0.getLong(0) -> r0).toMap
    }
    val v44 = screenAt(4, 4)
    val v28 = screenAt(2, 8)
    assert(v28(7L).getBoolean(3) && v28(7L).getLong(1) == 1L &&
      v28(7L).getDouble(2) == 1.0,
      s"exact copy must be caught under the retuned banding: ${v28(7L)}")
    assert(!v28(17L).getBoolean(3) && !v44(17L).getBoolean(3))
    val dup28 = v28.collect { case (id, r0) if r0.getBoolean(3) => id }.toSet
    val dup44 = v44.collect { case (id, r0) if r0.getBoolean(3) => id }.toSet
    assert(dup28.subsetOf(dup44),
      s"retune may only tighten admission: $dup28 vs $dup44")
  }

  test("occupancy report: retune flag fires on an over-occupied 4x4 " +
    "index and clears after the 2x8 retune; testdata index is healthy") {
    // the decision half of q_dedup_reband (VERDICT r11 missing #3): the
    // report must say RETUNE exactly when the standing shape's expected
    // verify candidates per probe exceed the budget.
    import spark.implicits._
    // real corpus: near-unique keys, both shapes healthy → flag false
    // everywhere, and every doc lands in exactly one bucket per band
    val real = Dedup.qDedupOccupancy.fn(spark, sf001).collect()
    assert(real.length == 6, s"4 + 2 band rows expected: ${real.toSeq}")
    assert(real.forall(!_.getBoolean(7)),
      s"testdata index must not flag retune: ${real.toSeq}")
    val nDocs = graft.io.Tables.load(spark, sf001, "documents").count()
    assert(real.forall(_.getLong(3) == nDocs))
    assert(real.forall(r0 => r0.getLong(4) >= r0.getLong(5)),
      "max occupancy must dominate p99")
    // dense near-dup fixture: 80 docs sharing a 50-word core with 10
    // unique words each → pairwise resemblance ≈ 0.67, so an r=4 key
    // collides at s⁴ ≈ 0.2 (fat buckets, exp_cand ≈ 16 ≫ budget 8)
    // while r=8 collides at s⁸ ≈ 0.04 (thin buckets, exp_cand ≪ 8)
    def txt(i: Int) = ((1 to 50).map(w => s"core$w") ++
      (1 to 10).map(w => s"u${i}x$w")).mkString(" ")
    val fix = (1 to 80).map(i => (i.toLong, txt(i))).toDF("doc_id", "text")
    val fsh = graft.functions.TextHash
      .addShingleHashes(fix, col("text")).select("doc_id", "hs")
    def rep(bands: Int, r: Int, scheme: String) =
      Dedup.occupancyReport(
        Dedup.lshBandsWith(fsh, bands, r).select("doc_id", "band", "key"),
        scheme).orderBy("band").collect()
    val r44 = rep(4, 4, "4x4")
    val r28 = rep(2, 8, "2x8")
    assert(r44.exists(_.getBoolean(7)),
      s"retune must fire on the over-occupied 4x4 index: ${r44.toSeq}")
    assert(r28.forall(!_.getBoolean(7)),
      s"retune must clear on the 2x8 retuned index: ${r28.toSeq}")
    // the flag moved because the measured quantity did, with margin:
    // the fattest retuned band costs less than the thinnest standing one
    assert(r28.map(_.getDouble(6)).max < r44.map(_.getDouble(6)).min,
      s"2x8 exp_cand ${r28.map(_.getDouble(6)).toSeq} vs " +
        s"4x4 ${r44.map(_.getDouble(6)).toSeq}")
  }

  test("monitored retune: the report's flag drives the action — reband " +
    "happens exactly when occupancy is over budget, and is a no-op " +
    "otherwise") {
    import spark.implicits._
    graft.io.Tables.ensureSessionRegistered(spark) // graft_md5_mod31
    // dense near-dup corpus (same shape as the occupancy test): the
    // standing 4×4 index is over budget → retuneIfNeeded must ACT,
    // and the index it returns must itself report healthy
    def txt(i: Int) = ((1 to 50).map(w => s"core$w") ++
      (1 to 10).map(w => s"u${i}x$w")).mkString(" ")
    val fix = (1 to 80).map(i => (i.toLong, txt(i))).toDF("doc_id", "text")
    val fsh = graft.functions.TextHash
      .addShingleHashes(fix, col("text")).select("doc_id", "hs")
    val standing44 = Dedup.lshBandsWith(fsh, 4, 4)
      .select("doc_id", "band", "key")
    val (retuned, acted) = Dedup.retuneIfNeeded(fsh, standing44)
    assert(acted, "over-budget index must trigger the retune")
    assert(Dedup.occupancyReport(retuned, "post").collect()
      .forall(!_.getBoolean(7)),
      "the acted-on index must itself report healthy")
    assert(retuned.select("band").distinct().count() == 2,
      "the action must be the 2-band re-projection")
    // healthy corpus: the report says no → the SAME frame comes back
    val docsDf = graft.io.Tables.load(spark, sf001, "documents")
    val csh = graft.functions.TextHash
      .addShingleHashes(docsDf, col("text")).select("doc_id", "hs")
    val healthy = Dedup.lshBandsWith(csh, 4, 4)
      .select("doc_id", "band", "key")
    val (kept, acted2) = Dedup.retuneIfNeeded(csh, healthy)
    assert(!acted2, "healthy index must not be retuned")
    assert(kept eq healthy, "no-op must return the standing frame itself")
  }

  test("ann lifecycle: the mid-chain retrain trains on the prefix only") {
    // q_ann_lifecycle's point vs q_ann_ivf_retrain is the training-set
    // exclusion: the quantizer must be trained WITHOUT the post-retrain
    // batch. Pin that the exclusion is non-vacuous (prefix-trained and
    // whole-corpus centroids differ at sf0.001) and that the excluded
    // batch is non-empty (the index genuinely grows after the retrain).
    val codes = Similarity.int8Codes(spark, sf001).select("vec_id", "c")
    val b3 = expr(Similarity.ivfBatchSql(3))
    val prefix = Similarity.lloydCentroids(codes.filter(!b3), 8, rounds = 3)
    val whole = Similarity.lloydCentroids(codes, 8, rounds = 3)
    assert(prefix.map(_._1) == whole.map(_._1)) // same cluster ids
    assert(prefix != whole,
      "prefix-trained centroids must differ from whole-corpus training")
    assert(codes.filter(b3).count() > 0)
  }

  test("lifecycle: fold survivors stay visible THROUGH the retune; " +
    "rejected docs stay invisible") {
    // the composition property neither standalone gate exercises: the
    // retune must re-band the FOLDED state (base + batch-A survivors),
    // not the base snapshot it started from. Fixture (A = %10==2,
    // B = %10==8):
    //   1  base,    txt(w)
    //   2  batch A, novel txt(v)        -> survives, folded
    //   12 batch A, near-copy of 1      -> rejected, NOT folded
    //   8  batch B, EXACT copy of 2     -> caught via the RETUNED index,
    //      best match the survivor (from_batch_a)
    //   18 batch B, EXACT copy of 12    -> matches base 1 (j<1), never
    //      the rejected 12 (j=1.0)
    //   28 batch B, novel txt(q)        -> admitted
    import spark.implicits._
    def txt(p: String) = (1 to 50).map(i => s"$p$i").mkString(" ")
    def mut(p: String) = ((1 to 49).map(i => s"$p$i") :+ "zz").mkString(" ")
    val fix = Seq(1L -> txt("w"), 2L -> txt("v"), 12L -> mut("w"),
      8L -> txt("v"), 18L -> mut("w"), 28L -> txt("q"))
      .toDF("doc_id", "text")
    val fsh = graft.functions.TextHash
      .addShingleHashes(fix, col("text")).select("doc_id", "hs")
    val inA = col("doc_id") % 10 === 2
    val inB = col("doc_id") % 10 === 8
    val isBase = !inA && !inB
    val bands4 = Dedup.lshBands(fsh).select("doc_id", "band", "key")
    val vA = Dedup.screenBatch(fix.filter(inA), bands4.filter(inA),
      bands4.filter(isBase), fsh.filter(inA), fsh).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!vA(2L).getBoolean(3) && vA(12L).getBoolean(3),
      s"phase A: 2 survives, 12 rejected: $vA")
    // the retune: re-band base + survivors at 2x8 (the engine's shape)
    val survivors = vA.values.filter(!_.getBoolean(3))
      .map(_.getLong(0)).toSeq.toDF("doc_id")
    val retuned = Dedup.lshBandsWith(
      fsh.filter(isBase).unionByName(
        fsh.filter(inA).join(survivors, Seq("doc_id"), "left_semi")),
      2, 8).select("doc_id", "band", "key")
    val vB = Dedup.screenBatch(fix.filter(inB),
      Dedup.lshBandsWith(fsh.filter(inB), 2, 8)
        .select("doc_id", "band", "key"),
      retuned, fsh.filter(inB), fsh).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(vB(8L).getBoolean(3) && vB(8L).getLong(1) == 2L &&
      vB(8L).getDouble(2) == 1.0,
      s"8 must match the folded survivor 2 through the retune: ${vB(8L)}")
    assert(vB(18L).getBoolean(3) && vB(18L).getLong(1) == 1L &&
      vB(18L).getDouble(2) < 1.0,
      s"18 must match base 1, never rejected 12: ${vB(18L)}")
    assert(!vB(28L).getBoolean(3), s"novel 28 must be admitted: ${vB(28L)}")
  }
}
