package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Codec-less media-container header arithmetic: the dimensions / sample
  * format of PNG, JPEG and WAV payloads are plain byte fields in the first
  * bytes of the container, readable without any image/audio library.
  *
  * Read side ([[pngDims]]/[[jpegDims]]/[[wavFormat]]) and write side
  * ([[pngBytes]]/[[jpegBytes]]/[[wavBytes]]) are deliberately independent
  * spellings (manual shifts vs ByteBuffer) so a round-trip through both is
  * a real check, not an identity. All reads are bounds-guarded: truncated
  * or corrupt payloads yield None, never an exception mid-pipeline.
  *
  * Field layouts follow the public container specs:
  *   - PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" +
  *     big-endian width, height).
  *   - JPEG: SOI then marker segments `FF xx len_be16 ...`; frame
  *     dimensions are big-endian 16-bit fields of the first SOF segment
  *     (markers C0-CF except C4/C8/CC), which may sit behind APP/COM
  *     segments that must be walked over.
  *   - WAV: "RIFF" size "WAVE", then chunks `id size_le32 data` (odd sizes
  *     pad one byte); the "fmt " chunk data holds little-endian
  *     audio_format(2) channels(2) sample_rate(4) ...
  */
object HeaderCodec {

  // ---------- read side: manual shift arithmetic ----------

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k))

  val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (width, height) from the IHDR chunk, or None if the payload is not a
    * PNG or is truncated before the dimension fields. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
        PngSignature.indices.forall(i => b(i) == PngSignature(i)) &&
        ascii(b, 12, "IHDR"))
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** SOF markers carrying frame dimensions: C0-CF minus C4 (DHT),
    * C8 (JPG extension), CC (DAC). */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  /** (width, height) from the first SOF segment, walking over any APP/COM
    * segments before it; None for non-JPEG, truncated, or SOF-less data. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      val marker = b(i + 1) & 0xff
      if (isSof(marker)) {
        // segment: len(2) precision(1) height(2) width(2) ...
        return if (i + 9 <= b.length) Some((be16(b, i + 7), be16(b, i + 5)))
        else None
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length field
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        i += 2 + segLen
      }
    }
    None
  }

  /** (sample_rate, n_channels) from the "fmt " chunk, walking the RIFF
    * chunk list (odd chunk sizes pad one byte); None otherwise. */
  def wavFormat(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE"))
      return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0) return None
      if (ascii(b, i, "fmt ")) {
        // data: audio_format(2) channels(2) sample_rate(4) ...
        return if (i + 16 <= b.length && size >= 8)
          Some((le32(b, i + 12), le16(b, i + 10)))
        else None
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  /** The "data" chunk's payload bytes (PCM samples), walking the RIFF
    * chunk list like [[wavFormat]]; None for non-WAV or truncated data. */
  def wavData(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE"))
      return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0) return None
      if (ascii(b, i, "data")) {
        return if (i + 8 + size <= b.length)
          Some(java.util.Arrays.copyOfRange(b, i + 8, i + 8 + size))
        else None
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  // ---------- write side: ByteBuffer, independent of the readers ----------

  /** Minimal valid-layout PNG: signature + IHDR (8-bit RGBA, zeroed CRC —
    * headers only, no pixel data codec) + `tail` as opaque trailing bytes
    * standing in for the IDAT stream. */
  def pngBytes(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 25 + tail.length)
      .order(ByteOrder.BIG_ENDIAN)
    buf.put(PngSignature)
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(8.toByte).put(6.toByte) // bit depth, colour type RGBA
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
    buf.putInt(0) // CRC (not validated by header readers)
    buf.put(tail)
    buf.array()
  }

  /** Minimal JPEG: SOI + APP0(JFIF) + COM carrying `tail` + SOF0 — the SOF
    * sits BEHIND two walkable segments, so readers must really scan. */
  def jpegBytes(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    val com = tail.take(512) // COM payload; keep the segment length in range
    val buf = ByteBuffer.allocate(2 + 18 + (4 + com.length) + 19)
      .order(ByteOrder.BIG_ENDIAN)
    buf.putShort(0xffd8.toShort) // SOI
    buf.putShort(0xffe0.toShort).putShort(16) // APP0, len 16
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.putShort(0x0101.toShort) // version 1.1
    buf.put(0.toByte) // density units
    buf.putShort(1).putShort(1) // x/y density
    buf.put(0.toByte).put(0.toByte) // thumbnail w/h
    buf.putShort(0xfffe.toShort).putShort((2 + com.length).toShort).put(com)
    buf.putShort(0xffc0.toShort).putShort(17) // SOF0, len 8 + 3*3
    buf.put(8.toByte) // precision
    buf.putShort(height.toShort).putShort(width.toShort)
    buf.put(3.toByte) // components
    Seq(1, 2, 3).foreach { id =>
      buf.put(id.toByte).put(0x11.toByte).put(0.toByte)
    }
    buf.array()
  }

  /** Minimal WAV: RIFF/WAVE with a LIST chunk BEFORE "fmt " (readers must
    * chunk-walk) and `tail` as the data chunk. */
  def wavBytes(sampleRate: Int, channels: Int,
      tail: Array[Byte]): Array[Byte] = {
    val bits = 16
    val data = if (tail.length % 2 == 0) tail else tail :+ 0.toByte
    val listData = "INFO".getBytes("US-ASCII")
    val total = 4 + (8 + listData.length) + (8 + 16) + (8 + data.length)
    val buf = ByteBuffer.allocate(8 + total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(listData.length).put(listData)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * bits / 8) // byte rate
    buf.putShort((channels * bits / 8).toShort) // block align
    buf.putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }
}
