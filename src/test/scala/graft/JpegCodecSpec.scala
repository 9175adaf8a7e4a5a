package graft

import graft.multimodal.{HeaderCodec, JpegCodec, Multimodal}

/** The entropy-coded tier (baseline JPEG via the JDK's bundled codec):
  * lossy output has no value-exact SQL oracle, so the gate is what CAN
  * be exact — dimensions, DC-only blocks, a bounded error for smooth
  * content, agreement between two independent parsers — plus the
  * distributed round trip over the real corpus. */
class JpegCodecSpec extends SparkSpec {

  test("uniform (DC-only) image round-trips pixel-exact") {
    val px = Array.fill(16 * 16)(128.toByte)
    val jpg = JpegCodec.encodeGray8(16, 16, px)
    // a real JFIF stream, not a re-wrap: SOI marker + nontrivial size
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(jpg.length > 100)
    val Some((w, h, back)) = JpegCodec.decodeGray8(jpg)
    assert((w, h) == (16, 16))
    // a uniform block quantizes to its DC coefficient alone: exact
    assert(back.forall(b => (b & 0xff) == 128), back.take(8).toSeq)
  }

  test("gradient round-trips within a bounded per-pixel error") {
    val w = 24; val h = 16
    val px = Array.tabulate(w * h)(k => ((k % w) * 10 % 256).toByte)
    val Some((dw, dh, back)) = JpegCodec.decodeGray8(
      JpegCodec.encodeGray8(w, h, px))
    assert((dw, dh) == (w, h))
    val maxErr = px.indices.map(k =>
      math.abs((back(k) & 0xff) - (px(k) & 0xff))).max
    assert(maxErr <= 48, s"maxErr=$maxErr") // lossy, but not garbage
  }

  test("HeaderCodec SOF parser agrees with a real encoder's bytes") {
    // the hand-written marker walk, validated against bytes produced by
    // an independent real implementation (not our own fixtures)
    val jpg = JpegCodec.encodeGray8(31, 17, Array.fill(31 * 17)(7.toByte))
    assert(HeaderCodec.jpegDims(jpg).contains((31, 17)))
  }

  test("undecodable bytes yield None, never an exception") {
    assert(JpegCodec.decodeGray8(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decodeGray8(Array.fill(64)(0xff.toByte)).isEmpty)
  }

  test("distributed JPEG round trip over the corpus: dims exact, error bounded") {
    val rows = Multimodal.jpegRoundTrip(spark, sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (ew, eh) = ((8 + r.doc_id % 24).toInt, (8 + r.doc_id % 16).toInt)
      assert((r.width, r.height) == (ew, eh), r)
      // decode dims == independent SOF-walk dims on the same bytes
      assert((r.header_w, r.header_h) == (r.width, r.height), r)
      assert(r.max_err <= 64, r) // text-derived pixels are blocky; bounded
      assert(r.mean_err_x100 <= 1600, r) // mean |err| <= 16
    }
  }
}
