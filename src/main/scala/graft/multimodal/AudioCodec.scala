package graft.multimodal

/** Deterministic 16-bit PCM audio stand-in + frame-feature extraction.
  *
  * The container ships no audio codecs (the same constraint that makes
  * [[FakeCodec]] stub image decode), so the WAVEFORM is synthetic — an
  * LCG over (doc_id, sample_idx), closed-form replayable by the SQL
  * oracle — while everything the engine is actually responsible for is
  * REAL: little-endian int16 encode to a binary payload, the byte-level
  * parse back to amplitudes, 160-sample framing (10 ms at 16 kHz), and
  * the per-frame features a speech-data curation pipeline gates on
  * (energy for silence trimming, zero-crossing rate as the classic
  * voiced/unvoiced + noise discriminator, peak for clipping detection).
  * All features are exact integer arithmetic, so the oracle pins them
  * bit-for-bit. Swapping in a real decoder replaces [[synthPcm]] with a
  * file read + codec call; [[frameFeatures]] and the plan shape are
  * unchanged.
  */
object AudioCodec {
  /** 800–1200 samples per doc — spans partial-final-frame cases. */
  def nSamples(id: Long): Int = (800 + id % 401).toInt

  /** amp_i = ((id·1103515245 + i·12345) mod 2^16) − 2^15 — all terms
    * non-negative before the mod, so Spark/Scala `%` and DuckDB `%`
    * agree; products stay far under 2^63 for any test-SF doc_id. */
  def sampleAt(id: Long, i: Int): Int =
    ((id * 1103515245L + i * 12345L) % 65536L - 32768L).toInt

  /** Real encode: amplitudes → little-endian int16 byte payload. */
  def synthPcm(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = sampleAt(id, i)
      out(2 * i) = (amp & 0xff).toByte
      out(2 * i + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Real RIFF/WAVE container encode — the full chunk grammar, not just
    * a fixed 44-byte header: RIFF size header, canonical 16-byte PCM
    * `fmt ` chunk (mono, 16 kHz, 16-bit), a LIST/INFO chunk whose ISFT
    * text length varies with doc_id so ODD sizes exercise RIFF's
    * even-boundary pad byte, then the `data` chunk with [[synthPcm]]'s
    * payload. Gives [[wavChunkAudit]] genuine encoder output to walk,
    * the same way m12 audits real ImageIO PNGs. */
  def encodeWav(id: Long): Array[Byte] = {
    val pcm = synthPcm(id)
    val isft = ("graft" + "x" * (id % 4).toInt).getBytes("US-ASCII")
    val isftPad = isft.length % 2
    val listBody = 4 + 8 + isft.length + isftPad
    val total = 12 + (8 + 16) + (8 + listBody) + (8 + pcm.length)
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      .put("INFO".getBytes("US-ASCII"))
      .put("ISFT".getBytes("US-ASCII")).putInt(isft.length).put(isft)
    if (isftPad == 1) out.put(0.toByte)
    out.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    out.array()
  }

  final case class WavAudit(doc_id: Long, n_chunks: Int, sample_rate: Int,
                            n_samples: Long, data_byte_sum: Long,
                            riff_ok: Boolean, fmt_ok: Boolean)

  /** Container triage WITHOUT decode (the audio analog of m12's PNG
    * chunk audit): walk the real RIFF chunk table validating every size
    * field against the byte budget — magic + form type, the RIFF size
    * header against the actual payload length, per-chunk bounds, the
    * even-boundary pad after odd chunks, and exact termination at the
    * final byte. Truncated, oversized, or trailing-garbage payloads
    * fail by ARITHMETIC, never by exception. `fmt_ok` checks the full
    * PCM header contract (format/channels/rate/byteRate/blockAlign/
    * bits); `data_byte_sum` fingerprints the payload bytes without
    * interpreting them. Header cost only — the data chunk is summed,
    * not decoded. */
  def wavChunkAudit(id: Long, bytes: Array[Byte]): WavAudit = {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    val headerOk = bytes.length >= 12 && cc(0) == "RIFF" &&
      cc(8) == "WAVE" && le32(4) == bytes.length - 8
    var nChunks = 0
    var rate = 0
    var nSamples = 0L
    var byteSum = 0L
    var fmtOk = false
    var off = 12
    var walkOk = headerOk
    while (walkOk && off < bytes.length) {
      if (off + 8 > bytes.length) walkOk = false
      else {
        val sz = le32(off + 4)
        if (sz > Int.MaxValue || off + 8 + sz > bytes.length) walkOk = false
        else {
          val n = sz.toInt
          nChunks += 1
          cc(off) match {
            case "fmt " if n >= 16 =>
              rate = le32(off + 12).toInt
              fmtOk = le16(off + 8) == 1 && le16(off + 10) == 1 &&
                rate == 16000 && le32(off + 16) == 32000L &&
                le16(off + 20) == 2 && le16(off + 22) == 16
            case "data" =>
              nSamples = n / 2
              var j = off + 8
              val e = off + 8 + n
              while (j < e) { byteSum += bytes(j) & 0xff; j += 1 }
            case _ => ()
          }
          off += 8 + n + (n % 2)
        }
      }
    }
    WavAudit(id, nChunks, rate, nSamples, byteSum,
      headerOk && walkOk && off == bytes.length, fmtOk)
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_samples: Long,
                         energy: Long, zero_crossings: Long, peak: Long)

  /** Real decode + framing: parse the int16 payload, emit one feature
    * row per `frameLen`-sample frame (final frame may be partial).
    * Zero crossings count strict sign flips between ADJACENT samples
    * within a frame (a zero sample crosses nothing) — the oracle states
    * the same via LAG. Energy fits long: 160 · 32768² ≈ 1.7e11. */
  def frameFeatures(id: Long, pcm: Array[Byte],
                    frameLen: Int): Iterator[Frame] = {
    val n = pcm.length / 2
    val amps = new Array[Int](n)
    var i = 0
    while (i < n) {
      val lo = pcm(2 * i) & 0xff
      val hi = pcm(2 * i + 1).toInt
      amps(i) = (hi << 8) | lo
      i += 1
    }
    val nFrames = (n + frameLen - 1) / frameLen
    (0 until nFrames).iterator.map { f =>
      val s0 = f * frameLen
      val e = math.min(s0 + frameLen, n)
      var energy = 0L
      var zc = 0L
      var peak = 0L
      var j = s0
      while (j < e) {
        val a = amps(j)
        energy += a.toLong * a
        if (j > s0) {
          val p = amps(j - 1)
          if ((p < 0 && a > 0) || (p > 0 && a < 0)) zc += 1
        }
        val ab = math.abs(a.toLong)
        if (ab > peak) peak = ab
        j += 1
      }
      Frame(id, f, (e - s0).toLong, energy, zc, peak)
    }
  }
}
