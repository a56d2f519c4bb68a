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
