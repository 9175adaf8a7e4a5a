package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** MJPEG-in-AVI container codec — the video tier, parsed for REAL with
  * zero dependencies beyond the JDK: AVI is a RIFF form (like WAV, whose
  * chunk walk [[HeaderCodec.wavData]] already does), and an MJPEG stream
  * is one complete baseline JPEG per frame, which [[JpegCodec]] already
  * decodes through the JDK's bundled entropy codec. The JDK ships no
  * video codec; MJPEG is the one mainstream video format whose frame
  * payloads need none — so this is genuine container parsing, not a fake.
  *
  * Layout follows the public AVI RIFF form (OpenDML / MSDN "AVI RIFF File
  * Reference"):
  *
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl'
  *     'avih'(56: usec/frame, maxbytes/sec, pad, flags, TOTAL FRAMES,
  *            initial, streams, bufsize, WIDTH, HEIGHT, reserved[4])
  *     LIST('strl'
  *       'strh'(56: 'vids' 'MJPG' … scale rate start LENGTH … rcFrame)
  *       'strf'(40: BITMAPINFOHEADER, biCompression='MJPG')))
  *   'JUNK'(alignment filler — readers must skip it)
  *   LIST('movi'
  *     '00dc'(jpeg)  |  LIST('rec ' '00dc'(jpeg))  …)
  *   'idx1'(16/frame: ckid flags offset size))
  * }}}
  *
  * The encoder deliberately exercises the walk: a JUNK chunk sits between
  * hdrl and movi, every odd-indexed frame is wrapped in a nested
  * LIST('rec ') (the interleave grouping real muxers emit), and odd-sized
  * JPEG payloads take the RIFF pad byte. The decoder is an independent
  * spelling (manual little-endian shift arithmetic vs the encoder's
  * ByteBuffer), so a round trip is a real check, not an identity —
  * mirroring the [[HeaderCodec]] read/write split. All reads are
  * bounds-guarded: truncated or corrupt payloads yield None, never an
  * exception mid-pipeline.
  */
object AviCodec {

  /** One decoded video: header dims + per-frame compressed JPEG bytes
    * (decode the pixels with [[JpegCodec.decodeGray8]] per frame). */
  final case class AviVideo(
      width: Int, height: Int, totalFrames: Int,
      frames: Vector[Array[Byte]])

  // ---------- write side: ByteBuffer ----------

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val padded = data.length + (data.length & 1)
    val buf = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc(id)).putInt(data.length).put(data)
    buf.array() // trailing pad byte (if any) stays zero
  }

  private def list(subtype: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(subtype) ++ body)

  private def avihChunk(w: Int, h: Int, nFrames: Int,
      fps: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1000000 / math.max(1, fps)) // dwMicroSecPerFrame
    b.putInt(0) // dwMaxBytesPerSec
    b.putInt(0) // dwPaddingGranularity
    b.putInt(0x10) // dwFlags: AVIF_HASINDEX
    b.putInt(nFrames) // dwTotalFrames
    b.putInt(0) // dwInitialFrames
    b.putInt(1) // dwStreams
    b.putInt(0) // dwSuggestedBufferSize
    b.putInt(w).putInt(h)
    // dwReserved[4] stays zero
    b.array()
  }

  private def strhChunk(nFrames: Int, fps: Int, w: Int,
      h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    b.put(fourcc("vids")).put(fourcc("MJPG"))
    b.putInt(0) // dwFlags
    b.putShort(0).putShort(0) // wPriority, wLanguage
    b.putInt(0) // dwInitialFrames
    b.putInt(1) // dwScale
    b.putInt(math.max(1, fps)) // dwRate (rate/scale = fps)
    b.putInt(0) // dwStart
    b.putInt(nFrames) // dwLength, in frames for video
    b.putInt(0) // dwSuggestedBufferSize
    b.putInt(-1) // dwQuality: default
    b.putInt(0) // dwSampleSize: 0 = variable (one frame per chunk)
    // rcFrame: left top right bottom as 16-bit
    b.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  private def strfChunk(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(40) // biSize
    b.putInt(w).putInt(h)
    b.putShort(1) // biPlanes
    b.putShort(24) // biBitCount
    b.put(fourcc("MJPG")) // biCompression
    b.putInt(w * h * 3) // biSizeImage
    // x/y pels-per-meter, clr used/important stay zero
    b.array()
  }

  /** Encode pre-compressed JPEG frames as one MJPEG AVI. Odd-indexed
    * frames are wrapped in LIST('rec ') groups and a JUNK chunk precedes
    * movi, so decoders must really walk the chunk tree. */
  def encodeMjpeg(w: Int, h: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = list("hdrl",
      chunk("avih", avihChunk(w, h, jpegFrames.length, fps)) ++
        list("strl",
          chunk("strh", strhChunk(jpegFrames.length, fps, w, h)) ++
            chunk("strf", strfChunk(w, h))))
    val junk = chunk("JUNK", new Array[Byte](12))
    val moviChunks = jpegFrames.zipWithIndex.map { case (jpg, f) =>
      val dc = chunk("00dc", jpg)
      if (f % 2 == 1) list("rec ", dc) else dc
    }
    // idx1 offsets are relative to the 'movi' fourcc (the common muxer
    // convention): the first chunk id sits at offset 4.
    val offsets = moviChunks.scanLeft(4)((off, c) => off + c.length)
    val idxEntries = jpegFrames.indices.map { f =>
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      // a 'rec '-wrapped frame's ckid sits 12 bytes into the LIST chunk
      val rec = f % 2 == 1
      b.put(fourcc("00dc"))
      b.putInt(0x10) // AVIIF_KEYFRAME (every MJPEG frame is one)
      b.putInt(offsets(f) + (if (rec) 12 else 0))
      b.putInt(jpegFrames(f).length)
      b.array()
    }
    val movi = list("movi", moviChunks.flatten.toArray)
    val idx1 = chunk("idx1", idxEntries.flatten.toArray)
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ junk ++ movi ++ idx1)
  }

  // ---------- read side: manual shift arithmetic ----------

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Chunk sizes are unsigned in RIFF: read into a Long so a crafted
    * size near 2^31 cannot wrap `offset + size` negative and slip past
    * the bounds guards (the None-not-exception contract). */
  private def le32u(b: Array[Byte], i: Int): Long = le32(b, i) & 0xFFFFFFFFL

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k))

  /** `##dc` / `##db` stream-data chunk ids (compressed / uncompressed
    * video of stream ##). */
  private def isFrameId(b: Array[Byte], i: Int): Boolean = {
    def digit(c: Int) = c >= '0' && c <= '9'
    i + 4 <= b.length && digit(b(i) & 0xff) && digit(b(i + 1) & 0xff) &&
      (b(i + 2) & 0xff) == 'd' &&
      ((b(i + 3) & 0xff) == 'c' || (b(i + 3) & 0xff) == 'b')
  }

  /** Collect frame payloads from a movi (or nested 'rec ') chunk range;
    * None on any structural violation. */
  private def walkFrames(b: Array[Byte], start: Int, end: Int,
      out: scala.collection.mutable.ArrayBuffer[Array[Byte]])
      : Boolean = {
    // Long cursor throughout (ADVICE r7 #4): a back-cast after each step
    // can wrap negative when a chunk abuts Int.MaxValue and turn the
    // None-not-exception contract into an ArrayIndexOutOfBounds on the
    // next iteration. `i + 8 <= end` in Long guarantees every toInt
    // below is in-range.
    var i: Long = start
    while (i + 8 <= end) {
      val h = i.toInt // safe: i + 8 <= end <= Int.MaxValue
      if (i + 8L + le32u(b, h + 4) > end) return false
      val size = le32u(b, h + 4).toInt // safe: bounded by end - i - 8
      if (ascii(b, h, "LIST")) {
        if (size < 4) return false
        if (ascii(b, h + 8, "rec ") &&
            !walkFrames(b, h + 12, h + 8 + size, out)) return false
        // other list subtypes inside movi are skipped whole
      } else if (isFrameId(b, h)) {
        out += java.util.Arrays.copyOfRange(b, h + 8, h + 8 + size)
      }
      // the missing-final-pad-byte case lands exactly at end + 1
      i = i + 8L + size + (size & 1)
    }
    i >= end // a chunk header straddling the end is a truncation
  }

  /** Decode an AVI payload: dims + declared frame total from the avih
    * header, frame payload bytes from the movi chunk walk. None for
    * non-AVI, truncated, or structurally corrupt data. */
  def decode(b: Array[Byte]): Option[AviVideo] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "AVI "))
      return None
    val riffEnd = math.min(b.length.toLong, 8L + le32u(b, 4)).toInt
    var width = -1
    var height = -1
    var total = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // Long cursors, same rationale as [[walkFrames]] (ADVICE r7 #4)
    var i: Long = 12
    while (i + 8 <= riffEnd) {
      val h = i.toInt // safe: i + 8 <= riffEnd <= Int.MaxValue
      if (i + 8L + le32u(b, h + 4) > riffEnd) return None
      val size = le32u(b, h + 4).toInt // safe: bounded by riffEnd - i - 8
      if (ascii(b, h, "LIST") && size >= 4) {
        if (ascii(b, h + 8, "hdrl")) {
          // scan the hdrl list for the avih chunk (always its first
          // member in practice, but walk rather than assume)
          var j: Long = h + 12
          val end = h + 8 + size
          while (j + 8 <= end && total < 0) {
            val g = j.toInt // safe: j + 8 <= end <= Int.MaxValue
            if (j + 8L + le32u(b, g + 4) > end) return None
            val s2 = le32u(b, g + 4).toInt
            if (ascii(b, g, "avih") && s2 >= 40) {
              total = le32(b, g + 8 + 16)
              width = le32(b, g + 8 + 32)
              height = le32(b, g + 8 + 36)
            }
            j = j + 8L + s2 + (s2 & 1)
          }
        } else if (ascii(b, h + 8, "movi")) {
          if (!walkFrames(b, h + 12, h + 8 + size, frames)) return None
        }
      }
      i = i + 8L + size + (size & 1)
    }
    if (width < 0 || total < 0) None
    else Some(AviVideo(width, height, total, frames.toVector))
  }
}
