package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec for 8-bit greyscale images — encode and decode,
  * pure JDK (`java.util.zip` Deflater/Inflater + CRC32), no image
  * libraries. This upgrades the pixel tier of the multimodal pipeline
  * from the documented stub to an actual decode for PNG: the compressed
  * IDAT stream is really inflated and the five scanline filters (None /
  * Sub / Up / Average / Paeth, PNG spec §9) really reversed.
  *
  * Scope: colour type 0 (greyscale), bit depth 8, no interlace — the
  * post-decode `w×h` byte buffer is exactly the [[Multimodal.RawImage]]
  * representation the resize/energy kernels already operate on. Lossy
  * entropy-coded codecs (JPEG pixels, video) remain out of scope: those
  * genuinely need codec tables this sandbox lacks.
  *
  * Encoder and decoder are independent spellings (the encoder computes
  * filtered deltas forward; the decoder reconstructs with its own
  * predictor arithmetic), so the round-trip is a real check. The decoder
  * is defensive: wrong signature, truncated chunks, CRC mismatch,
  * unsupported layout, or a corrupt deflate stream all yield None, never
  * an exception mid-pipeline.
  */
object PngCodec {

  private val Ihdr = "IHDR".getBytes("US-ASCII")
  private val Idat = "IDAT".getBytes("US-ASCII")
  private val Iend = "IEND".getBytes("US-ASCII")

  // ---------- encode ----------

  private def chunk(tag: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(data.length).put(tag).put(data)
    val crc = new CRC32
    crc.update(tag)
    crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Filter one scanline forward (encode side): returns the filter-type
    * byte followed by `w` filtered bytes. `prior` is the previous raw
    * scanline (all zeros for the first row, per spec). */
  private def filterLine(raw: Array[Byte], prior: Array[Byte],
      filter: Int): Array[Byte] = {
    val w = raw.length
    val out = new Array[Byte](w + 1)
    out(0) = filter.toByte
    var x = 0
    while (x < w) {
      val a = if (x > 0) raw(x - 1) & 0xff else 0 // left
      val b = prior(x) & 0xff                     // up
      val c = if (x > 0) prior(x - 1) & 0xff else 0 // up-left
      val pred = filter match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, c)
      }
      out(x + 1) = ((raw(x) & 0xff) - pred).toByte
      x += 1
    }
    out
  }

  /** Encode a row-major w×h gray8 buffer as a real PNG. `filterFor(y)`
    * picks the per-scanline filter type (0..4); `idatSplit` caps each
    * IDAT chunk's size so multi-IDAT reassembly is exercised. */
  def encodeGray8(w: Int, h: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ => 0,
      idatSplit: Int = Int.MaxValue): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h,
      s"need $w*$h=${w * h} pixels, got ${pixels.length}")
    val rawStream = new Array[Byte]((w + 1) * h)
    var zeros = new Array[Byte](w)
    var y = 0
    while (y < h) {
      val row = java.util.Arrays.copyOfRange(pixels, y * w, (y + 1) * w)
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f")
      System.arraycopy(filterLine(row, zeros, f), 0, rawStream,
        y * (w + 1), w + 1)
      zeros = row
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(rawStream)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zBuf.write(tmp, 0, n)
    }
    deflater.end()
    val z = zBuf.toByteArray

    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // colour type: greyscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()

    val out = new java.io.ByteArrayOutputStream()
    out.write(HeaderCodec.PngSignature)
    out.write(chunk(Ihdr, ihdr))
    var off = 0
    while (off < z.length) {
      val n = math.min(idatSplit, z.length - off)
      out.write(chunk(Idat, java.util.Arrays.copyOfRange(z, off, off + n)))
      off += n
    }
    if (z.isEmpty) out.write(chunk(Idat, Array.emptyByteArray))
    out.write(chunk(Iend, Array.emptyByteArray))
    out.toByteArray
  }

  // ---------- decode ----------

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def tagIs(b: Array[Byte], i: Int, tag: Array[Byte]): Boolean =
    b(i) == tag(0) && b(i + 1) == tag(1) && b(i + 2) == tag(2) &&
      b(i + 3) == tag(3)

  /** PNG spec §9.4 Paeth predictor: nearest of a (left), b (up),
    * c (up-left) to a + b − c, ties a, then b. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a gray8 PNG produced by any conformant encoder: chunk walk
    * with CRC validation, multi-IDAT concatenation, full inflate, and
    * per-scanline unfiltering. Returns (w, h, row-major pixels), or None
    * on anything malformed or outside the gray8/no-interlace layout. */
  def decodeGray8(png: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val sig = HeaderCodec.PngSignature
    if (png.length < 8 || !sig.indices.forall(i => png(i) == sig(i)))
      return None
    var i = 8
    var w = -1
    var h = -1
    var ok = true
    val z = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (ok && !sawEnd && i + 12 <= png.length) {
      val len = be32(png, i)
      if (len < 0 || i + 12 + len > png.length) ok = false
      else {
        val crc = new CRC32
        crc.update(png, i + 4, 4 + len)
        if (crc.getValue.toInt != be32(png, i + 8 + len)) ok = false
        else if (tagIs(png, i + 4, Ihdr)) {
          if (len != 13) ok = false
          else {
            w = be32(png, i + 8)
            h = be32(png, i + 12)
            val depth = png(i + 16) & 0xff
            val colour = png(i + 17) & 0xff
            val interlace = png(i + 20) & 0xff
            if (depth != 8 || colour != 0 || interlace != 0 ||
                w <= 0 || h <= 0) ok = false
          }
        } else if (tagIs(png, i + 4, Idat)) {
          z.write(png, i + 8, len)
        } else if (tagIs(png, i + 4, Iend)) {
          sawEnd = true
        }
        i += 12 + len
      }
    }
    if (!ok || !sawEnd || w <= 0) return None

    // inflate to the (filterByte + w) * h raw stream
    val raw = new Array[Byte]((w + 1) * h)
    val inflater = new Inflater()
    inflater.setInput(z.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    if (got != raw.length) return None

    // unfilter scanline by scanline
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val a = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val b = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        px(y * w + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }
}
