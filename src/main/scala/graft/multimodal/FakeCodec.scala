package graft.multimodal

/** Decoded-media metadata row produced by the (stubbed) codec. */
case class MediaMeta(doc_id: Long, width: Int, height: Int,
                     n_frames: Int, n_bytes: Long)

/** STUB CODEC — the container ships no image/audio/video libraries, so
  * `decode` fabricates deterministic dimensions from the payload length.
  * In a real deployment this is the only function to replace (e.g. with
  * a JNI/javacpp decoder); everything around it — binary columns, the
  * typed mapPartitions batch shape, downstream frame sampling — is the
  * production plumbing and is what the specs exercise.
  */
object FakeCodec {
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // 64-bit intermediate: n * 31 overflows Int for payloads > ~69 MB,
    // which would diverge from the oracle's 64-bit arithmetic.
    MediaMeta(
      doc_id = id,
      width = 64 + n % 577,
      height = 64 + (n.toLong * 31 % 457).toInt,
      n_frames = 1 + n % 7,
      n_bytes = n.toLong)
  }

  /** Fake "resize": rescale the stub dimensions preserving aspect. */
  def resize(m: MediaMeta, maxSide: Int): MediaMeta = {
    val side = math.max(m.width, m.height)
    if (side <= maxSide) m
    else {
      val scale = maxSide.toDouble / side
      m.copy(width = math.max(1, (m.width * scale).toInt),
             height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** REAL container parsing for the two formats a codec-less container
    * can still synthesize and validate byte-for-byte: binary PPM (P6)
    * images and canonical PCM WAV audio. Header-only reads — the pixel
    * and sample payloads are never copied or materialized beyond the
    * row's own byte array, so MB-scale payloads cost exactly one pass
    * of the mapPartitions iterator. Unrecognized payloads fall back to
    * the arithmetic stub, keeping [[decode]]'s deterministic contract
    * for the fixture corpus. */
  def decodeReal(id: Long, bytes: Array[Byte]): MediaMeta =
    parsePng(id, bytes).orElse(parsePpm(id, bytes)).orElse(parseWav(id, bytes))
      .getOrElse(decode(id, bytes))

  /** REAL image decode via `javax.imageio` (PNG ships in every JRE —
    * no external codec needed): signature-sniffed, then fully decoded
    * through ImageIO's PNGImageReader. This is the one genuinely
    * compressed format the engine decodes for real; width/height come
    * from the decoded raster, not the header arithmetic. A payload
    * with the PNG signature that fails to decode is corrupt media —
    * fall back to the stub rather than poison the partition (the
    * dirty-row posture of the CSV source applied to pixels). */
  private[multimodal] def parsePng(id: Long,
                                   bytes: Array[Byte]): Option[MediaMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length < 8 ||
        !sig.indices.forall(k => bytes(k) == sig(k).toByte)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some(MediaMeta(id, img.getWidth, img.getHeight, 1,
        bytes.length.toLong))
    } catch { case _: java.io.IOException => None }
  }

  /** Decode a PNG payload FULLY — dimensions plus a pixel checksum
    * (sum of the red channel over the raster) from one ImageIO.read —
    * the lossless-roundtrip witness m10's oracle recomputes
    * arithmetically. Returns (width, height, sum). */
  def pngPixelSum(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        s += (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, s)
  }

  /** Encode a deterministic grayscale test card as a REAL PNG:
    * dimensions and every pixel derive from `id` alone, so any engine
    * can state the expected decode output in closed form. */
  def encodeTestPng(id: Long): Array[Byte] = {
    val w = (1 + id % 16).toInt
    val h = (1 + (id * 7) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 31 + y * 17 + id) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** PNG container walk WITHOUT decode (m12): traverse the chunk table
    * (8-byte signature, then length/type/data/CRC frames), parse the
    * IHDR dimensions from raw bytes, recompute every chunk's CRC32 and
    * check the stream terminates with IEND — the cheap corrupt-media
    * triage a pipeline runs BEFORE spending decode cycles. Real
    * format, real checksum (java.util.zip.CRC32 — the PNG spec's
    * polynomial), no codec involved. Returns
    * (ihdr_width, ihdr_height, all CRCs valid, IEND seen). */
  def pngChunkAudit(bytes: Array[Byte]): (Int, Int, Boolean, Boolean) = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var off = 8 // PNG signature
    var w = 0
    var h = 0
    var crcOk = bytes.length >= 8
    var sawEnd = false
    var stop = false
    while (!stop && off + 12 <= bytes.length) {
      val len = be32(off).toInt
      if (len < 0 || off + 12L + len > bytes.length) {
        crcOk = false
        stop = true // truncated chunk: stop, flag invalid
      } else {
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        if (typ == "IHDR" && len >= 8) {
          w = be32(off + 8).toInt
          h = be32(off + 12).toInt
        }
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        if (crc.getValue != be32(off + 8 + len)) crcOk = false
        if (typ == "IEND") { sawEnd = true; stop = true }
        off += 12 + len
      }
    }
    (w, h, crcOk, sawEnd)
  }

  /** `P6` + whitespace-separated width/height/maxval (with `#` comment
    * support), then raw pixels. Returns width×height, 1 frame. */
  private[multimodal] def parsePpm(id: Long,
                                   bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 9 || bytes(0) != 'P' || bytes(1) != '6') return None
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    val headerEnd = math.min(bytes.length, 256) // header is tiny; bound the scan
    while (v < 3 && i < headerEnd) {
      if (isWs(bytes(i))) i += 1
      else if (bytes(i) == '#') {
        while (i < headerEnd && bytes(i) != '\n') i += 1
      } else {
        var x = 0
        var any = false
        while (i < headerEnd && bytes(i) >= '0' && bytes(i) <= '9') {
          x = x * 10 + (bytes(i) - '0'); i += 1; any = true
        }
        if (!any) return None
        vals(v) = x; v += 1
      }
    }
    if (v < 3 || vals(0) <= 0 || vals(1) <= 0) None
    else Some(MediaMeta(id, vals(0), vals(1), 1, bytes.length.toLong))
  }

  /** Canonical 44-byte RIFF/WAVE/fmt/data layout: width = channels,
    * height = bits per sample, n_frames = PCM sample frames. */
  private[multimodal] def parseWav(id: Long,
                                   bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 44) return None
    def ascii(off: Int, s: String) =
      s.indices.forall(k => bytes(off + k) == s.charAt(k).toByte)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE") ||
        !ascii(12, "fmt ") || !ascii(36, "data")) return None
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    val channels = le16(22)
    val bits = le16(34)
    val dataLen = le32(40)
    // Non-byte-aligned PCM (e.g. 12-bit) has no whole-byte frame size,
    // and a mono 8-bit data chunk > 2 GiB would wrap the Int frame
    // count — both fall back to the arithmetic stub rather than lie.
    if (bits <= 0 || bits % 8 != 0) return None
    val frameBytes = channels * (bits / 8)
    val frames = if (frameBytes > 0) dataLen / frameBytes else -1L
    if (frameBytes <= 0 || frames > Int.MaxValue.toLong) None
    else Some(MediaMeta(id, channels, bits,
      frames.toInt, bytes.length.toLong))
  }
}
