package graft

import graft.multimodal.{HeaderCodec, Multimodal}

/** The codec-less header parsers, pinned to HAND-WRITTEN literal byte
  * fixtures (independent of the serializers), plus truncation/corruption
  * guards and the serializer↔parser round trip. */
class HeaderCodecSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // PNG, 260 x 3: signature, IHDR length 13, "IHDR", w be32, h be32,
  // bit depth 8, colour 6, compress/filter/interlace 0, CRC (ignored)
  private val png260x3 = bytes(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
    0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
    0x00, 0x00, 0x01, 0x04, 0x00, 0x00, 0x00, 0x03,
    0x08, 0x06, 0x00, 0x00, 0x00, 0xde, 0xad, 0xbe, 0xef)

  // JPEG, 257 x 2, progressive (SOF2), with APP0 and COM segments BEFORE
  // the SOF — the parser must walk both to find it
  private val jpeg257x2 = bytes(
    0xff, 0xd8, // SOI
    0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00, // APP0 "JFIF\0"
    0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
    0xff, 0xfe, 0x00, 0x04, 0xab, 0xcd, // COM, 2 payload bytes
    0xff, 0xc2, 0x00, 0x11, 0x08, // SOF2, len 17, precision 8
    0x00, 0x02, 0x01, 0x01, // height 2, width 257
    0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)

  // WAV, 44100 Hz stereo, with a LIST chunk BEFORE "fmt "
  private val wav44100st = bytes(
    0x52, 0x49, 0x46, 0x46, 0x32, 0x00, 0x00, 0x00, // "RIFF" size 50
    0x57, 0x41, 0x56, 0x45, // "WAVE"
    0x4c, 0x49, 0x53, 0x54, 0x04, 0x00, 0x00, 0x00, // "LIST" size 4
    0x49, 0x4e, 0x46, 0x4f, // "INFO"
    0x66, 0x6d, 0x74, 0x20, 0x10, 0x00, 0x00, 0x00, // "fmt " size 16
    0x01, 0x00, 0x02, 0x00, // PCM, 2 channels
    0x44, 0xac, 0x00, 0x00, // 44100
    0x10, 0xb1, 0x02, 0x00, // byte rate 176400
    0x04, 0x00, 0x10, 0x00, // block align 4, 16 bits
    0x64, 0x61, 0x74, 0x61, 0x02, 0x00, 0x00, 0x00, 0x00, 0x00) // "data"

  test("PNG fixture: IHDR big-endian dimensions") {
    assert(HeaderCodec.pngDims(png260x3).contains((260, 3)))
  }

  test("JPEG fixture: SOF2 found behind APP0 and COM segments") {
    assert(HeaderCodec.jpegDims(jpeg257x2).contains((257, 2)))
  }

  test("WAV fixture: fmt chunk found behind a LIST chunk") {
    assert(HeaderCodec.wavFormat(wav44100st).contains((44100, 2)))
  }

  test("truncated and corrupt payloads parse to None, never throw") {
    assert(HeaderCodec.pngDims(png260x3.take(20)).isEmpty)
    assert(HeaderCodec.pngDims(
      bytes(0x88) ++ png260x3.drop(1)).isEmpty) // bad signature byte
    assert(HeaderCodec.jpegDims(jpeg257x2.take(25)).isEmpty) // SOI+APP0 only
    assert(HeaderCodec.jpegDims(
      bytes(0xff, 0xd8, 0x00, 0x00)).isEmpty) // marker desync
    assert(HeaderCodec.wavFormat(wav44100st.take(30)).isEmpty) // fmt cut off
    // chunk size pointing past the end: the walk terminates, no fmt found
    assert(HeaderCodec.wavFormat(bytes(
      0x52, 0x49, 0x46, 0x46, 0xff, 0x00, 0x00, 0x00,
      0x57, 0x41, 0x56, 0x45,
      0x4c, 0x49, 0x53, 0x54, 0xff, 0xff, 0x00, 0x00)).isEmpty)
    assert(HeaderCodec.pngDims(Array.emptyByteArray).isEmpty)
    assert(HeaderCodec.jpegDims(Array.emptyByteArray).isEmpty)
    assert(HeaderCodec.wavFormat(Array.emptyByteArray).isEmpty)
  }

  test("serializer round-trips through the independent parser") {
    val tail = "opaque body bytes".getBytes("UTF-8")
    for (w <- Seq(1, 16, 257, 65535); h <- Seq(1, 3, 211, 65535)) {
      assert(HeaderCodec.pngDims(
        HeaderCodec.pngBytes(w, h, tail)).contains((w, h)))
      assert(HeaderCodec.jpegDims(
        HeaderCodec.jpegBytes(w, h, tail)).contains((w, h)))
    }
    for (rate <- Seq(8000, 44100, 48000); ch <- Seq(1, 2, 6)) {
      assert(HeaderCodec.wavFormat(
        HeaderCodec.wavBytes(rate, ch, tail)).contains((rate, ch)))
    }
    // odd-length WAV body exercises the pad byte
    assert(HeaderCodec.wavFormat(
      HeaderCodec.wavBytes(22050, 1, tail.take(3))).contains((22050, 1)))
  }

  test("nearest-neighbour resize: literal fixtures down, up, identity") {
    // 4×2 → 2×2: picks columns 0,2 of each selected row
    val px = bytes(10, 20, 30, 40, 50, 60, 70, 80)
    assert(Multimodal.resizeNearest(px, 4, 2, 2, 2).toSeq
      == bytes(10, 30, 50, 70).toSeq)
    // 1×1 → 3×3 upsample: replicates the single pixel
    assert(Multimodal.resizeNearest(bytes(7), 1, 1, 3, 3).toSeq
      == Seq.fill(9)(7.toByte))
    // identity
    assert(Multimodal.resizeNearest(px, 4, 2, 4, 2).toSeq == px.toSeq)
    // 2×2 → 4×4: each source pixel becomes a 2×2 block
    assert(Multimodal.resizeNearest(bytes(1, 2, 3, 4), 2, 2, 4, 4).toSeq
      == bytes(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4).toSeq)
  }

  test("wavData extracts the data chunk; frame energies localize a spike") {
    val tail = Array.tabulate(40)(i => (if (i == 35) 200 else 1).toByte)
    val wav = HeaderCodec.wavBytes(8000, 1, tail)
    val data = HeaderCodec.wavData(wav)
    assert(data.exists(_.sameElements(tail))) // even length: no pad
    // odd tail gains exactly one zero pad byte
    val padded = HeaderCodec.wavData(
      HeaderCodec.wavBytes(8000, 1, tail.take(33)))
    assert(padded.exists(d => d.length == 34 && d.last == 0))
    assert(HeaderCodec.wavData(png260x3).isEmpty)
    assert(HeaderCodec.wavData(wav44100st.take(30)).isEmpty) // truncated
    val es = Multimodal.frameEnergies(data.get, 16)
    assert(es.length == 3) // 40 bytes -> frames of 16, 16, 8
    assert(es(0) == 16L && es(1) == 16L)
    assert(es(2) == 7L + 200L * 200L) // 7 unit bytes + the spike at 35
    assert(es.indexOf(es.max) == 2) // spike localizes to the last frame
  }

  test("extractDims sniffs the container from bytes, not the mime label") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "application/octet-stream", png260x3),
      Multimodal.MediaRow(2L, "image/png", wav44100st), // mislabeled
      Multimodal.MediaRow(3L, "text/plain", "not media".getBytes("UTF-8")))
    val got = Multimodal.extractDims(rows.toDS()).collect()
      .map(d => d.doc_id -> d).toMap
    assert(got(1L).width.contains(260) && got(1L).height.contains(3))
    assert(got(2L).sample_rate.contains(44100) &&
      got(2L).n_channels.contains(2) && got(2L).width.isEmpty)
    assert(got(3L).width.isEmpty && got(3L).sample_rate.isEmpty)
  }
}
