package graft.multimodal

/** Deterministic AVI container encode + chunk-table audit — the video
  * rung of the container-audit matrix (m12 walks real PNG chunk
  * tables, m14 walks real RIFF/WAVE; this completes the modality with
  * RIFF/AVI: nested LIST grammar, per-frame `00dc` chunks in the
  * `movi` list, and the `idx1` frame index cross-checked against the
  * chunks it indexes).
  *
  * The container ships no video codecs (the same constraint that makes
  * [[FakeCodec]] stub image decode), so FRAME PAYLOADS are synthetic —
  * closed-form LCG bytes the SQL oracle replays exactly — while
  * everything the engine is responsible for is REAL: the full nested
  * RIFF encode (hdrl with avih/strl/strh/strf headers, movi with
  * size-prefixed frame chunks and RIFF's even-boundary pad bytes,
  * idx1 with per-frame offset/length entries) and the byte-level walk
  * back that validates every size field against the byte budget,
  * every index entry against the chunk it points at, and exact stream
  * termination. Truncated, oversized, or index-skewed payloads fail
  * by ARITHMETIC, never by exception. Header cost only — frame bytes
  * are summed as a fingerprint, not decoded. Swapping in a real
  * demuxer replaces the synthetic payload; the walk and the plan
  * shape are unchanged.
  */
object VideoCodec {
  /** 3–7 frames per doc; frame sizes 20–26 bytes span odd sizes so the
    * even-boundary pad byte is exercised (the m14 ISFT trick). */
  def nFrames(id: Long): Int = (3 + id % 5).toInt
  def frameSize(id: Long, f: Int): Int = (20 + (id + f) % 7).toInt
  def frameByte(id: Long, f: Int, j: Int): Int =
    ((id * 31 + f * 17 + j * 7) % 256).toInt
  def width(id: Long): Int = (16 * (1 + id % 4)).toInt
  def height(id: Long): Int = (16 * (1 + id % 3)).toInt

  private val Avih = 56
  private val Strh = 56
  private val Strf = 40
  // hdrl list body: 'hdrl' + avih chunk + strl LIST (strh + strf)
  private val StrlBody = 4 + (8 + Strh) + (8 + Strf)
  private val HdrlBody = 4 + (8 + Avih) + (8 + StrlBody)

  /** Real RIFF/AVI encode — the full nested chunk grammar. */
  def encodeAvi(id: Long): Array[Byte] = {
    val frames = nFrames(id)
    val w = width(id)
    val h = height(id)
    val sizes = (0 until frames).map(frameSize(id, _))
    val moviBody = 4 + sizes.map(sz => 8 + sz + sz % 2).sum
    val idxBody = 16 * frames
    val total = 12 + (8 + HdrlBody) + (8 + moviBody) + (8 + idxBody)
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    cc("RIFF"); out.putInt(total - 8); cc("AVI ")
    // ---- hdrl -------------------------------------------------------
    cc("LIST"); out.putInt(HdrlBody); cc("hdrl")
    cc("avih"); out.putInt(Avih)
    out.putInt(33333).putInt(0).putInt(0).putInt(0x10) // µs/frame … HASINDEX
      .putInt(frames).putInt(0).putInt(1).putInt(0)    // totalFrames, streams=1
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)         // dwReserved[4]
    cc("LIST"); out.putInt(StrlBody); cc("strl")
    cc("strh"); out.putInt(Strh)
    cc("vids"); cc("GRFT")
    out.putInt(0).putShort(0).putShort(0).putInt(0)    // flags, prio/lang, init
      .putInt(1).putInt(30).putInt(0).putInt(frames)   // scale, rate, start, length
      .putInt(0).putInt(0).putInt(0)                   // bufsize, quality, samplesize
      .putShort(0).putShort(0)                         // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort)         // rcFrame right, bottom
    cc("strf"); out.putInt(Strf)
    out.putInt(40).putInt(w).putInt(h)                 // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(0)    // planes, 24bpp, BI_RGB
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // ---- movi -------------------------------------------------------
    cc("LIST"); out.putInt(moviBody); cc("movi")
    for (f <- 0 until frames) {
      cc("00dc"); out.putInt(sizes(f))
      var j = 0
      while (j < sizes(f)) { out.put(frameByte(id, f, j).toByte); j += 1 }
      if (sizes(f) % 2 == 1) out.put(0.toByte)
    }
    // ---- idx1: offsets relative to the 'movi' fourcc ---------------
    cc("idx1"); out.putInt(idxBody)
    var off = 4
    for (f <- 0 until frames) {
      cc("00dc"); out.putInt(0x10)                     // AVIIF_KEYFRAME
      out.putInt(off).putInt(sizes(f))
      off += 8 + sizes(f) + sizes(f) % 2
    }
    out.array()
  }

  final case class AviAudit(doc_id: Long, n_frames: Int, width: Int,
                            height: Int, frame_byte_sum: Long,
                            riff_ok: Boolean, avih_ok: Boolean,
                            idx_ok: Boolean)

  /** Container triage WITHOUT decode: walk the nested chunk tables
    * validating every size field against the byte budget, descend into
    * `hdrl` (header contract) and `movi` (count frames, fingerprint
    * payload bytes), then cross-check every `idx1` entry — fourcc,
    * offset from the `movi` fourcc, and length — against the chunk
    * walk it indexes. `riff_ok` = header + bounded walk + exact
    * termination; `avih_ok` = internal header consistency (declared
    * frame/stream counts match the walked chunks, `vids` stream,
    * BITMAPINFOHEADER dimensions match avih); `idx_ok` = every index
    * entry matches its chunk one-to-one. */
  def aviChunkAudit(id: Long, bytes: Array[Byte]): AviAudit = {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")

    val headerOk = bytes.length >= 12 && cc(0) == "RIFF" &&
      cc(8) == "AVI " && le32(4) == bytes.length - 8

    var walkOk = headerOk
    var nMovi = 0
    var byteSum = 0L
    var w = 0
    var h = 0
    var avihFrames = -1L
    var avihStreams = -1L
    var strlLists = 0
    var strhVids = false
    var strhLength = -1L
    var strfOk = false
    // (offset-from-movi-fourcc, size) per walked frame chunk
    val walked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var idxEntries: Seq[(String, Long, Long)] = null

    // Bounded chunk walk over [from, to); returns false on any size
    // violation. `inMovi`/`inHdrl` select the per-chunk handling.
    def walk(from: Int, to: Int, moviBase: Int, mode: String): Boolean = {
      var off = from
      var ok = true
      while (ok && off < to) {
        if (off + 8 > to) ok = false
        else {
          val sz = le32(off + 4)
          if (sz > Int.MaxValue || off + 8 + sz > to) ok = false
          else {
            val n = sz.toInt
            val tag = cc(off)
            (mode, tag) match {
              case (_, "LIST") if n >= 4 =>
                val listType = cc(off + 8)
                val inner = listType match {
                  case "hdrl" => walk(off + 12, off + 8 + n, -1, "hdrl")
                  case "strl" =>
                    strlLists += 1
                    walk(off + 12, off + 8 + n, -1, "strl")
                  case "movi" => walk(off + 12, off + 8 + n, off + 8, "movi")
                  case _ => true // unknown lists are legal RIFF
                }
                ok = inner
              case ("hdrl", "avih") if n >= 40 =>
                avihFrames = le32(off + 8 + 16)
                avihStreams = le32(off + 8 + 24)
                w = le32(off + 8 + 32).toInt
                h = le32(off + 8 + 36).toInt
              case ("strl", "strh") if n >= 36 =>
                strhVids = cc(off + 8) == "vids"
                strhLength = le32(off + 8 + 32)
              case ("strl", "strf") if n >= 40 =>
                strfOk = le32(off + 8) == 40 &&
                  le32(off + 8 + 4).toInt == w &&
                  le32(off + 8 + 8).toInt == h &&
                  le16(off + 8 + 14) == 24
              case ("movi", t) if t.endsWith("dc") || t.endsWith("wb") =>
                nMovi += 1
                walked += (((off - moviBase).toLong, sz))
                var j = off + 8
                val e = off + 8 + n
                while (j < e) { byteSum += bytes(j) & 0xff; j += 1 }
              case (_, "idx1") =>
                idxEntries = (0 until n / 16).map { i =>
                  val eo = off + 8 + 16 * i
                  (cc(eo), le32(eo + 8), le32(eo + 12))
                }
                idxEntries = if (n % 16 == 0) idxEntries else null
              case _ => ()
            }
            off += 8 + n + (n % 2)
          }
        }
      }
      ok && off == to
    }

    if (walkOk) walkOk = walk(12, bytes.length, -1, "top")

    val avihOk = walkOk && avihFrames == nMovi && avihStreams == strlLists &&
      strlLists == 1 && strhVids && strhLength == nMovi && strfOk
    val idxOk = walkOk && idxEntries != null &&
      idxEntries.size == walked.size &&
      idxEntries.zip(walked).forall { case ((tag, o, l), (wo, wl)) =>
        tag == "00dc" && o == wo && l == wl
      }
    AviAudit(id, nMovi, w, h, byteSum, walkOk, avihOk, idxOk)
  }
}
