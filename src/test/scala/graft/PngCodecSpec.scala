package graft

import java.util.zip.{Adler32, CRC32}

import graft.multimodal.{Multimodal, PngCodec}

/** The real PNG pixel codec: encoder↔decoder round trips across every
  * scanline filter type and multi-IDAT splits, a HAND-BUILT stored-block
  * zlib fixture the encoder could never have produced (the decoder must
  * honor raw deflate framing, not just its own compressor's output), and
  * corruption guards (CRC, truncation, unsupported layout). */
class PngCodecSpec extends SparkSpec {

  /** Deterministic test bitmap with enough byte structure that each
    * filter produces distinct deltas. */
  private def image(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(k => ((k * 37 + (k * k) % 251) % 256).toByte)

  test("round trip through each single filter type") {
    val (w, h) = (13, 7)
    val px = image(w, h)
    for (f <- 0 to 4) {
      val png = PngCodec.encodeGray8(w, h, px, _ => f)
      val out = PngCodec.decodeGray8(png)
      assert(out.isDefined, s"filter $f")
      val (dw, dh, dpx) = out.get
      assert((dw, dh) == (w, h), s"filter $f dims")
      assert(dpx.sameElements(px), s"filter $f pixels")
    }
  }

  test("round trip with mixed per-row filters and multi-IDAT split") {
    val (w, h) = (31, 23)
    val px = image(w, h)
    val png = PngCodec.encodeGray8(w, h, px, y => y % 5, idatSplit = 17)
    // more than one IDAT chunk actually present
    def countTag(b: Array[Byte], tag: String): Int =
      b.sliding(4).count(_.sameElements(tag.getBytes("US-ASCII")))
    assert(countTag(png, "IDAT") > 1, "expected a split IDAT stream")
    val Some((dw, dh, dpx)) = PngCodec.decodeGray8(png)
    assert((dw, dh) == (w, h) && dpx.sameElements(px))
  }

  test("1x1 and single-row/column edge shapes") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val px = image(w, h)
      for (f <- 0 to 4) {
        val Some((dw, dh, dpx)) =
          PngCodec.decodeGray8(PngCodec.encodeGray8(w, h, px, _ => f))
        assert((dw, dh) == (w, h) && dpx.sameElements(px), s"$w x $h f=$f")
      }
    }
  }

  /** A PNG built entirely by hand with a STORED (uncompressed) deflate
    * block — a stream shape the encoder never emits, so this pins the
    * decoder to the zlib/PNG specs rather than to the encoder. 2x2 image,
    * pixels 65,66,67,68, filter 0 rows. */
  test("decodes a hand-built stored-block zlib fixture") {
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new CRC32
      crc.update(tag.getBytes("US-ASCII"))
      crc.update(data)
      val len = data.length
      Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte) ++
        tag.getBytes("US-ASCII") ++ data ++
        Array[Byte]((crc.getValue >>> 24).toByte, (crc.getValue >>> 16).toByte,
          (crc.getValue >>> 8).toByte, crc.getValue.toByte)
    }
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 0, 0, 0, 0)
    // raw scanline stream: [filter 0, 65, 66], [filter 0, 67, 68]
    val raw = Array[Byte](0, 65, 66, 0, 67, 68)
    val adler = new Adler32
    adler.update(raw)
    val a = adler.getValue
    val zlib = Array[Byte](0x78, 0x01, // zlib header, CM=8
      0x01, // BFINAL=1, BTYPE=00 (stored)
      raw.length.toByte, 0, // LEN le16
      (~raw.length & 0xff).toByte, 0xff.toByte) ++ raw ++ // NLEN, data
      Array[Byte]((a >>> 24).toByte, (a >>> 16).toByte,
        (a >>> 8).toByte, a.toByte)
    val png = PngCodec.encodeGray8(1, 1, Array[Byte](0)).take(8) ++ // signature
      chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((w, h, px)) = PngCodec.decodeGray8(png)
    assert((w, h) == (2, 2))
    assert(px.toSeq == Seq[Byte](65, 66, 67, 68))
  }

  test("corruption and layout guards return None, never throw") {
    val good = PngCodec.encodeGray8(5, 4, image(5, 4), y => y % 5)
    assert(PngCodec.decodeGray8(good).isDefined)
    // flipped payload byte -> chunk CRC mismatch
    val crcBad = good.clone()
    crcBad(40) = (crcBad(40) ^ 0x5a).toByte
    assert(PngCodec.decodeGray8(crcBad).isEmpty, "CRC corruption")
    // truncated mid-chunk
    assert(PngCodec.decodeGray8(good.dropRight(7)).isEmpty, "truncated")
    // missing signature / non-PNG
    assert(PngCodec.decodeGray8(good.drop(1)).isEmpty, "bad signature")
    assert(PngCodec.decodeGray8("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(PngCodec.decodeGray8(Array.emptyByteArray).isEmpty)
    // RGBA header-only payload (HeaderCodec's zero-CRC write side) is
    // rejected both for CRC and colour type
    val rgba = graft.multimodal.HeaderCodec.pngBytes(4, 4, Array[Byte](1, 2))
    assert(PngCodec.decodeGray8(rgba).isEmpty, "unsupported colour type")
  }

  test("q_media_pixels decodes real PNGs and matches the generator") {
    import org.apache.spark.sql.functions._
    // the registered query's output must equal stats computed straight
    // off the raw bitmaps (no PNG round trip) — decode is the identity
    val viaPng = Multimodal.qMediaPixels.fn(spark, sf001)
    import spark.implicits._
    val direct = Multimodal.rawImageTable(spark, sf001).map { img =>
      var sum = 0L
      var cks = 0L
      var k = 0
      while (k < img.pixels.length) {
        val v = img.pixels(k) & 0xff
        sum += v
        cks += (k + 1).toLong * v
        k += 1
      }
      (img.doc_id, img.in_w, img.in_h, sum, cks)
    }.toDF("doc_id", "width", "height", "px_sum", "checksum")
      .orderBy("doc_id")
    assert(viaPng.collect().toSeq == direct.collect().toSeq)
    assert(viaPng.count() > 0)
  }
}
