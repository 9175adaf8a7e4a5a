package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Entropy-coded (baseline JPEG) tier via the JDK's BUNDLED codec:
  * `javax.imageio` ships in every Java SE runtime (`java.desktop`
  * module) — no external image library, so this stays inside the
  * sandbox's toolchain while exercising a real DCT + Huffman codec.
  *
  * JPEG is lossy, so unlike [[PngCodec]] the pixel payload admits no
  * value-exact SQL oracle (the decode is a deterministic function of
  * the compressed bytes, but an oracle would need the full
  * quantize→entropy round trip). The gate is therefore spec-level
  * (JpegCodecSpec): exact dimensions, EXACT pixels for uniform (DC-only)
  * blocks, bounded per-pixel error for gradients, and cross-validation
  * of [[HeaderCodec.jpegDims]] against bytes a real encoder emitted.
  */
object JpegCodec {

  // ImageIO never needs a display for JPEG, but pin headless so an
  // executor JVM can't try to bind a toolkit.
  System.setProperty("java.awt.headless", "true")

  // ImageIO.read/write wrap byte streams in FileCacheImage*Streams by
  // default — one TEMP FILE per payload inside the batch decode loops
  // (measured ~3x on the GIF query before GifCodec switched to explicit
  // MemoryCache streams). All payloads here are in-memory byte arrays;
  // never stage them on disk.
  ImageIO.setUseCache(false)

  /** Encode a gray8 bitmap as baseline JPEG (the writer's default
    * quality — deterministic for a given JDK). */
  def encodeGray8(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h, s"${px.length} pixels for ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", bos), "no JPEG writer in this JRE")
    bos.toByteArray
  }

  /** Decode a JPEG payload to (width, height, gray8 pixels); None on
    * undecodable bytes (never an exception mid-pipeline, matching
    * [[HeaderCodec]]'s posture). Color inputs are collapsed to gray by
    * the raster copy. */
  def decodeGray8(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val gray =
          if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
          else {
            val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
            // dispose() the Graphics: in the per-row mapPartitions decode
            // loop an undisposed context leaks native resources until GC
            val gg = g.createGraphics()
            try gg.drawImage(img, 0, 0, null)
            finally gg.dispose()
            g
          }
        val px = new Array[Byte](w * h)
        gray.getRaster.getDataElements(0, 0, w, h, px)
        (w, h, px)
      }
    } catch { case _: Exception => None }
}
