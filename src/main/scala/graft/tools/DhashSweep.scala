package graft.tools

import org.apache.spark.sql.SparkSession

import graft.multimodal.{Multimodal, PngCodec}

/** dHash OPERATING-POINT sweep (r14, VERDICT r13 next #4): catch rate
  * vs transform severity × verdict radius, with the BANDED-CANDIDATE
  * recall separated from the radius recall — the table a user needs to
  * set `GRAFT_DHASH_HAMMING` the way SCALE.md's ANN recall trajectories
  * set the IVF knobs, and the measured answer to "where does the 4×16
  * banding's radius-3 guarantee stop carrying?" (ADVICE r13).
  *
  * Per document of the given dir, the photo-like block bitmap
  * ([[Multimodal.dhashBitmap]]) is hashed, a TRANSFORMED copy is
  * hashed, and the pair contributes to per-transform aggregates:
  * Hamming distribution (p50/p90/max), band-candidate rate (share ≥ 1
  * of the 4×16-bit keys — what the equi-join can surface), and for
  * each radius r ∈ {4, 10, 16}: `within` (Hamming ≤ r — what the
  * radius WANTS to catch) vs `caught` (candidate AND ≤ r — what the
  * banded pipeline DOES catch). within − caught = the banding gap at
  * that radius. The `reencode` tier runs the full real PNG
  * encode→decode round trip (lossless, so its Hamming pins at 0);
  * geometric tiers transform decoded pixels directly (PNG losslessness
  * is spec-pinned separately, so the round trip adds nothing but
  * time).
  *
  * Transforms: pure re-encode; the planted (+3, +2) resize; uniform
  * up/downscales to 1.25×, 1.5×, 2×, 0.75×; brightness +16/+48
  * (clamped gray8 adds — gradient hashes are photometric-shift
  * invariant until clamping flattens gradients, and the sweep measures
  * exactly where).
  *
  * Run: `runMain graft.tools.DhashSweep [sfDir]` (default sf0.1);
  * prints one JSON line per transform. */
object DhashSweep {

  private def bright(px: Array[Byte], d: Int): Array[Byte] =
    px.map(v => math.min(255, math.max(0, (v & 0xff) + d)).toByte)

  /** (name, transform: (w, h, px) → (w', h', px')). */
  private def transforms(docId: Long)
      : Seq[(String, (Int, Int, Array[Byte]) => (Int, Int, Array[Byte]))] = {
    def rs(nw: Int, nh: Int, px: Array[Byte], w: Int, h: Int) =
      (nw, nh, Multimodal.resizeNearest(px, w, h, nw, nh))
    Seq(
      "reencode" -> ((w: Int, h: Int, px: Array[Byte]) => {
        val (dw, dh, dpx) = PngCodec.decodeGray8(
          PngCodec.encodeGray8(w, h, px,
            y => ((docId + y + 1) % 5).toInt, idatSplit = 64)).get
        (dw, dh, dpx)
      }),
      "resize_+3+2" -> ((w: Int, h: Int, px: Array[Byte]) =>
        rs(w + 3, h + 2, px, w, h)),
      "resize_1.25x" -> ((w: Int, h: Int, px: Array[Byte]) =>
        rs(w * 5 / 4, h * 5 / 4, px, w, h)),
      "resize_1.5x" -> ((w: Int, h: Int, px: Array[Byte]) =>
        rs(w * 3 / 2, h * 3 / 2, px, w, h)),
      "resize_2x" -> ((w: Int, h: Int, px: Array[Byte]) =>
        rs(w * 2, h * 2, px, w, h)),
      "resize_0.75x" -> ((w: Int, h: Int, px: Array[Byte]) =>
        rs(math.max(9, w * 3 / 4), math.max(8, h * 3 / 4), px, w, h)),
      "bright_+16" -> ((w: Int, h: Int, px: Array[Byte]) =>
        (w, h, bright(px, 16))),
      "bright_+48" -> ((w: Int, h: Int, px: Array[Byte]) =>
        (w, h, bright(px, 48))))
  }

  private val Radii = Seq(4, 10, 16)

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, encode}
    // (transform, hamming, sharesBand) per (doc, transform)
    val rows = graft.io.Tables.load(spark, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, body) =>
        val (w, h, px) = Multimodal.dhashBitmap(id, body)
        val orig = Multimodal.dhashBands(w, h, px)
        transforms(id).map { case (name, f) =>
          val (tw, th, tpx) = f(w, h, px)
          val t = Multimodal.dhashBands(tw, th, tpx)
          val ham = orig.zip(t)
            .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
          val shares = orig.zip(t).exists { case (a, b) => a == b }
          // the ADVICE r13 alternative, measured alongside: 8 bands of
          // 8 bits (each 16-bit key split in half) guarantee radius ≤ 7
          val shares8 = orig.zip(t).exists { case (a, b) =>
            (a & 0xff) == (b & 0xff) || (a >> 8) == (b >> 8) }
          (name, ham, shares, shares8)
        }
      }.toDF("transform", "hamming", "shares", "shares8")
      .collect() // bounded: |docs| × 8 transforms of 4 scalars
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach {
      case (name, rs) =>
        val hams = rs.map(_.getInt(1)).sorted
        val n = hams.length
        def pct(p: Double) = hams(math.min(n - 1, (p * n).toInt))
        val cand = rs.count(_.getBoolean(2))
        val cand8 = rs.count(_.getBoolean(3))
        val radii = Radii.map { r =>
          val within = rs.count(_.getInt(1) <= r)
          val caught = rs.count(x => x.getBoolean(2) && x.getInt(1) <= r)
          val caught8 = rs.count(x => x.getBoolean(3) && x.getInt(1) <= r)
          s""""r$r":{"within":$within,"caught":$caught,"caught8":$caught8}"""
        }.mkString(",")
        println(s"""{"dhash_sweep":{"dir":"$d","transform":"$name",""" +
          s""""n":$n,"p50":${pct(0.5)},"p90":${pct(0.9)},""" +
          s""""max":${hams.last},"candidates":$cand,"candidates8":$cand8,""" +
          radii + "}}")
    }
    // the other side of the 8×8 trade: FALSE-candidate rate between
    // UNRELATED images (adjacent-doc original hashes) under each
    // banding — what the equi-join's bucket volume scales with
    val origs = graft.io.Tables.load(spark, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .map { case (id, body) =>
        val (w, h, px) = Multimodal.dhashBitmap(id, body)
        val o = Multimodal.dhashBands(w, h, px)
        (id, o(0), o(1), o(2), o(3))
      }.collect().sortBy(_._1).map(t => Array(t._2, t._3, t._4, t._5))
    val pairs = origs.zip(origs.drop(1))
    val f16 = pairs.count { case (a, b) =>
      a.zip(b).exists { case (x, y) => x == y } }
    val f8 = pairs.count { case (a, b) =>
      a.zip(b).exists { case (x, y) =>
        (x & 0xff) == (y & 0xff) || (x >> 8) == (y >> 8) } }
    println(s"""{"dhash_unrelated":{"dir":"$d","pairs":${pairs.length},""" +
      s""""false_cand_16bit":$f16,"false_cand_8bit":$f8}}""")
    spark.stop()
  }
}
