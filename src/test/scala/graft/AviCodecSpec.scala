package graft

import graft.multimodal.{AviCodec, JpegCodec, Multimodal}

/** The video-container tier (MJPEG-in-AVI, VERDICT r5 #3): the container
  * walk is exact arithmetic and gated hard here; the per-frame JPEG
  * payloads are lossy in general, so pixel gates mirror JpegCodecSpec's
  * split — exact for DC-only (uniform) frames, bounded for gradients.
  * The registered q_avi_frames query is additionally value-gated against
  * the DuckDB oracle (uniform frames make the whole chain exact). */
class AviCodecSpec extends SparkSpec {

  private def gradFrame(w: Int, h: Int, f: Int): Array[Byte] =
    Array.tabulate(w * h)(k => (((k % w) * 10 + f * 31) % 256).toByte)

  test("mux → demux round trip: frame count, dims, payload identity") {
    val w = 24; val h = 16
    val jpegs = (0 until 5).map(f => JpegCodec.encodeGray8(w, h, gradFrame(w, h, f)))
    val avi = AviCodec.encodeMjpeg(w, h, 10, jpegs)
    // a real RIFF AVI form, not a re-wrap
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val Some(vid) = AviCodec.decode(avi)
    assert((vid.width, vid.height, vid.totalFrames) == (w, h, 5))
    assert(vid.frames.length == 5)
    // demuxed payloads are the EXACT encoder inputs: the container layer
    // is lossless even though the codec layer is not
    vid.frames.zip(jpegs).zipWithIndex.foreach { case ((got, put), f) =>
      assert(java.util.Arrays.equals(got, put), s"frame $f payload differs")
    }
  }

  test("decoded frames: gradient content within the JPEG error bound") {
    val w = 17; val h = 11 // non-multiple-of-8 dims exercise edge blocks
    val jpegs = (0 until 3).map(f => JpegCodec.encodeGray8(w, h, gradFrame(w, h, f)))
    val Some(vid) = AviCodec.decode(AviCodec.encodeMjpeg(w, h, 10, jpegs))
    vid.frames.zipWithIndex.foreach { case (jpg, f) =>
      val Some((dw, dh, px)) = JpegCodec.decodeGray8(jpg)
      assert((dw, dh) == (w, h))
      val ref = gradFrame(w, h, f)
      val maxErr = px.indices.map(k =>
        math.abs((px(k) & 0xff) - (ref(k) & 0xff))).max
      assert(maxErr <= 48, s"frame $f maxErr=$maxErr")
    }
  }

  test("uniform frames survive the full AVI→JPEG chain pixel-exact") {
    // the property the q_avi_frames oracle stands on: a DC-only block is
    // bit-exact through the JDK quantizer at every corpus value and dim
    for (w <- 8 to 15; h <- Seq(8, 11); v <- Seq(32, 77, 126)) {
      val px = Array.fill(w * h)(v.toByte)
      val avi = AviCodec.encodeMjpeg(w, h, 10,
        Seq(JpegCodec.encodeGray8(w, h, px)))
      val Some(vid) = AviCodec.decode(avi)
      val Some((_, _, back)) = JpegCodec.decodeGray8(vid.frames.head)
      assert(back.forall(b => (b & 0xff) == v), s"w=$w h=$h v=$v")
    }
  }

  test("reader walks nested rec lists and skips JUNK (odd frames are wrapped)") {
    // 4 frames → frames 1 and 3 sit inside LIST('rec ') by construction;
    // a reader that only scans top-level movi chunks returns 2, not 4
    val jpegs = (0 until 4).map(f => JpegCodec.encodeGray8(8, 8, gradFrame(8, 8, f)))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, jpegs)
    assert(AviCodec.decode(avi).get.frames.length == 4)
    // the JUNK chunk is really in the stream (readers had to skip it)
    val s = new String(avi.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("JUNK") && s.contains("rec ") && s.contains("idx1"))
  }

  test("odd-sized frame payloads take the RIFF pad byte and still demux") {
    val odd = Array.tabulate(33)(_.toByte) // not a real JPEG; container-only
    val even = Array.tabulate(40)(_.toByte)
    val Some(vid) = AviCodec.decode(AviCodec.encodeMjpeg(4, 4, 10, Seq(odd, even)))
    assert(vid.frames.length == 2)
    assert(java.util.Arrays.equals(vid.frames(0), odd))
    assert(java.util.Arrays.equals(vid.frames(1), even))
  }

  test("idx1 offsets point at the actual frame chunk ids") {
    def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def find(b: Array[Byte], s: String, from: Int): Int = {
      val pat = s.getBytes("US-ASCII")
      (from to b.length - pat.length).find(i =>
        pat.indices.forall(k => b(i + k) == pat(k))).getOrElse(-1)
    }
    val jpegs = (0 until 3).map(f => JpegCodec.encodeGray8(8, 8, gradFrame(8, 8, f)))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, jpegs)
    // locate the movi fourcc and the idx1 chunk independently of the codec
    val moviAt = find(avi, "movi", 0)
    val idxAt = find(avi, "idx1", moviAt)
    assert(moviAt > 0 && idxAt > moviAt)
    (0 until 3).foreach { f =>
      val e = idxAt + 8 + 16 * f
      assert(new String(avi.slice(e, e + 4), "US-ASCII") == "00dc")
      val off = le32(avi, e + 8)
      val size = le32(avi, e + 12)
      // the offset convention: relative to the movi fourcc position
      assert(new String(avi.slice(moviAt + off, moviAt + off + 4),
        "US-ASCII") == "00dc", s"idx1 entry $f offset $off")
      assert(size == jpegs(f).length)
    }
  }

  test("truncated or corrupt payloads yield None, never an exception") {
    val jpegs = Seq(JpegCodec.encodeGray8(8, 8, gradFrame(8, 8, 0)))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, jpegs)
    assert(AviCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviCodec.decode(avi.take(11)).isEmpty) // before the AVI fourcc
    assert(AviCodec.decode(avi.take(40)).isEmpty) // inside hdrl
    assert(AviCodec.decode(avi.take(avi.length / 2)).isEmpty) // inside movi
    val wav = graft.multimodal.HeaderCodec.wavBytes(8000, 1, Array[Byte](1))
    assert(AviCodec.decode(wav).isEmpty) // RIFF but not AVI
  }

  test("crafted chunk sizes near 2^31 yield None, not an overflow throw") {
    // RIFF sizes are unsigned: a size near 2^31 must not wrap
    // `offset + 8 + size` negative in Int and slip past the bounds guard
    // into copyOfRange/le32 (the None-not-exception contract)
    val jpegs = Seq(JpegCodec.encodeGray8(8, 8, gradFrame(8, 8, 0)))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, jpegs)
    def patched(off: Int, v: Long): Array[Byte] = {
      val b = avi.clone()
      (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      b
    }
    def find(id: String, from: Int): Int = {
      val pat = id.getBytes("US-ASCII")
      (from until avi.length - 4).find(i =>
        pat.indices.forall(k => avi(i + k) == pat(k))).get
    }
    // size fields of: the hdrl LIST (top-level walk), its inner avih
    // chunk (hdrl scan), and the first 00dc frame chunk (movi walk)
    val sizeOffsets = Seq(16, find("avih", 0) + 4, find("00dc", 0) + 4)
    for (off <- sizeOffsets; v <- Seq(0x7FFFFFF0L, 0xFFFFFFF0L)) {
      assert(AviCodec.decode(patched(off, v)).isEmpty,
        s"size 0x${v.toHexString} at offset $off must decode to None")
    }
  }

  test("distributed AVI frame extraction over the corpus (q_avi_frames)") {
    val rows = Multimodal.qAviFrames.fn(spark, sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 2 + id % 3, r) // n_frames from the movi walk
      assert(r.getInt(2) == (8 + id % 8).toInt, r)
      assert(r.getInt(3) == (8 + id % 4).toInt, r)
      assert(r.getLong(4) > 0 && r.getLong(5) > 0, r)
    }
  }
}
