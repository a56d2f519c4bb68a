package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{FakeCodec, MediaMeta}

/** Real-binary codec fixtures: deterministic P6 PPM images and PCM WAV
  * audio synthesized at MB-scale, pushed through the m02-shaped typed
  * mapPartitions decode stage — the plumbing the stub path never
  * exercised with realistic payload sizes. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  /** A valid binary PPM: header + w*h*3 deterministic pixel bytes. */
  private def ppm(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# synthetic fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val pixels = new Array[Byte](w * h * 3)
    var i = 0
    while (i < pixels.length) { pixels(i) = (i * 31 & 0xff).toByte; i += 1 }
    header ++ pixels
  }

  /** A canonical 44-byte-header PCM WAV with `frames` sample frames. */
  private def wav(channels: Int, bits: Int, frames: Int): Array[Byte] = {
    val dataLen = frames * channels * (bits / 8)
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(44100)
    b.putInt(44100 * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { b.put((i * 7 & 0xff).toByte); i += 1 }
    b.array()
  }

  test("PPM headers parse exactly (dims, comments, payload size)") {
    val bytes = ppm(1024, 768)
    val m = FakeCodec.decodeReal(7L, bytes)
    assert(m == MediaMeta(7L, 1024, 768, 1, bytes.length.toLong))
    assert(m.n_bytes > 1024L * 768 * 3)
  }

  test("WAV headers parse exactly (channels, bits, frames)") {
    val m = FakeCodec.decodeReal(9L, wav(2, 16, 44100))
    assert(m.width == 2 && m.height == 16 && m.n_frames == 44100)
    assert(m.n_bytes == 44L + 44100L * 2 * 2)
  }

  test("unrecognized payloads fall back to the arithmetic stub") {
    val junk = "not a media file".getBytes("US-ASCII")
    assert(FakeCodec.decodeReal(3L, junk) == FakeCodec.decode(3L, junk))
    // truncated magic must not trip the parsers
    assert(FakeCodec.decodeReal(4L, "P6".getBytes("US-ASCII")) ==
      FakeCodec.decode(4L, "P6".getBytes("US-ASCII")))
  }

  test("PNG roundtrip decodes REAL compressed images exactly") {
    // encodeTestPng writes a real PNG through javax.imageio; decodeReal
    // must sniff the signature and recover the exact raster — the one
    // genuinely compressed codec path in the engine.
    val bytes = FakeCodec.encodeTestPng(42L)
    val m = FakeCodec.decodeReal(42L, bytes)
    assert(m.width == (1 + 42 % 16) && m.height == (1 + (42 * 7) % 16) &&
      m.n_frames == 1, s"png decoded as $m")
    // pixel-exact roundtrip: the decoded checksum equals the closed form
    val (w, h, sum) = FakeCodec.pngPixelSum(bytes)
    val expected = (for { x <- 0 until w; y <- 0 until h }
      yield (x * 31 + y * 17 + 42L) % 256).sum
    assert(sum == expected, s"pixel checksum $sum != $expected")
    // a payload with the PNG magic but corrupt body falls back to the
    // stub instead of throwing mid-partition
    val corrupt = bytes.take(20)
    assert(FakeCodec.decodeReal(5L, corrupt) == FakeCodec.decode(5L, corrupt))
  }

  test("PNG chunk audit: valid stream passes; corruption trips the CRC") {
    val bytes = FakeCodec.encodeTestPng(42L)
    val (w, h, crcOk, iendOk) = FakeCodec.pngChunkAudit(bytes)
    assert(w == (1 + 42 % 16) && h == (1 + (42 * 7) % 16),
      s"IHDR parse got ${w}x$h")
    assert(crcOk && iendOk)
    // flip one data byte past the IHDR: the recomputed CRC must differ
    val flipped = bytes.clone()
    flipped(40) = (flipped(40) ^ 0x7f).toByte
    val (_, _, crcOk2, _) = FakeCodec.pngChunkAudit(flipped)
    assert(!crcOk2, "a flipped byte must trip the chunk CRC")
    // truncation: IEND never seen, validity flagged
    val (_, _, crcOk3, iendOk3) = FakeCodec.pngChunkAudit(bytes.dropRight(6))
    assert(!crcOk3 || !iendOk3)
  }

  test("MB-scale payloads stream through the mapPartitions decode stage") {
    // 24 images, ~2.4 MB each (~57 MB total), plus interleaved audio:
    // realistic media row sizes through the m02 batch shape. Dimensions
    // vary per row so a constant-folded plan can't fake the decode.
    val rows = (0 until 24).map { k =>
      (k.toLong, ppm(800 + k, 1000 + k))
    } ++ (100 until 108).map { k => (k.toLong, wav(2, 16, 22050 + k)) }
    val decoded = spark.createDataset(rows)
      .repartition(4)
      .mapPartitions(_.map { case (id, bytes) =>
        FakeCodec.decodeReal(id, bytes)
      })
      .collect()
      .map(m => m.doc_id -> m).toMap
    assert(decoded.size == 32)
    (0 until 24).foreach { k =>
      val m = decoded(k.toLong)
      assert(m.width == 800 + k && m.height == 1000 + k && m.n_frames == 1,
        s"image $k decoded as $m")
      assert(m.n_bytes > 2000000L, s"image $k payload suspiciously small: $m")
    }
    (100 until 108).foreach { k =>
      val m = decoded(k.toLong)
      assert(m.width == 2 && m.height == 16 && m.n_frames == 22050 + k,
        s"audio $k decoded as $m")
    }
  }

  test("AudioCodec: int16 roundtrip equals the LCG closed form; features earned") {
    import graft.multimodal.AudioCodec
    val id = 12345L
    val n = AudioCodec.nSamples(id)
    val pcm = AudioCodec.synthPcm(id)
    assert(pcm.length == n * 2)
    val frames = AudioCodec.frameFeatures(id, pcm, 160).toSeq
    assert(frames.map(_.n_samples).sum == n)
    assert(frames.last.n_samples == (if (n % 160 == 0) 160 else n % 160))
    // recompute frame 0 from the closed form DIRECTLY (no byte path):
    // the m13 oracle's arithmetic shortcut must match the binary path
    val a0 = (0 until 160).map(i => AudioCodec.sampleAt(id, i))
    val f0 = frames.head
    assert(f0.energy == a0.map(a => a.toLong * a).sum)
    assert(f0.peak == a0.map(a => math.abs(a.toLong)).max)
    assert(f0.zero_crossings == a0.sliding(2).count(p =>
      (p(0) < 0 && p(1) > 0) || (p(0) > 0 && p(1) < 0)))
    // negative path: a flipped payload byte changes the decoded
    // features — the parse really reads the bytes, not the formula
    val bad = pcm.clone(); bad(3) = (bad(3) ^ 0x40).toByte
    assert(AudioCodec.frameFeatures(id, bad, 160).toSeq != frames)
  }

  test("WAV chunk audit: valid container passes; each corruption class trips") {
    import graft.multimodal.AudioCodec
    for (id <- Seq(0L, 1L, 2L, 3L, 12345L)) { // all four ISFT pad parities
      val wav = AudioCodec.encodeWav(id)
      val a = AudioCodec.wavChunkAudit(id, wav)
      assert(a.riff_ok && a.fmt_ok, s"genuine encoder output failed audit: $a")
      assert(a.n_chunks == 3 && a.sample_rate == 16000)
      assert(a.n_samples == AudioCodec.nSamples(id).toLong)
      assert(a.data_byte_sum ==
        AudioCodec.synthPcm(id).map(b => (b & 0xff).toLong).sum)
      // corrupted RIFF size header
      val badSize = wav.clone(); badSize(4) = (badSize(4) ^ 0x01).toByte
      assert(!AudioCodec.wavChunkAudit(id, badSize).riff_ok)
      // truncated mid-chunk — RIFF size header PATCHED to match the
      // short length, so only the per-chunk bounds check can catch the
      // data chunk promising bytes that never come
      def patchLen(b: Array[Byte]): Array[Byte] = {
        val v = b.length - 8
        b(4) = (v & 0xff).toByte; b(5) = ((v >> 8) & 0xff).toByte
        b(6) = ((v >> 16) & 0xff).toByte; b(7) = ((v >> 24) & 0xff).toByte
        b
      }
      val trunc = patchLen(wav.take(wav.length - 5))
      assert(!AudioCodec.wavChunkAudit(id, trunc).riff_ok)
      // trailing garbage, header patched — the walk must land EXACTLY
      // on the final byte
      val extra = patchLen(wav ++ Array[Byte](0, 0))
      assert(!AudioCodec.wavChunkAudit(id, extra).riff_ok)
      // corrupted fmt chunk (sample rate) fails fmt_ok but not the walk
      val badFmt = wav.clone(); badFmt(24) = (badFmt(24) ^ 0x01).toByte
      val f = AudioCodec.wavChunkAudit(id, badFmt)
      assert(f.riff_ok && !f.fmt_ok, s"expected fmt-only failure: $f")
    }
  }

  test("AVI chunk audit: valid container passes; each corruption class trips") {
    import graft.multimodal.VideoCodec
    def patchLen(b: Array[Byte]): Array[Byte] = {
      val v = b.length - 8
      b(4) = (v & 0xff).toByte; b(5) = ((v >> 8) & 0xff).toByte
      b(6) = ((v >> 16) & 0xff).toByte; b(7) = ((v >> 24) & 0xff).toByte
      b
    }
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 12345L)) { // all frame counts + parities
      val avi = VideoCodec.encodeAvi(id)
      val a = VideoCodec.aviChunkAudit(id, avi)
      assert(a.riff_ok && a.avih_ok && a.idx_ok,
        s"genuine encoder output failed audit: $a")
      assert(a.n_frames == VideoCodec.nFrames(id))
      assert(a.width == VideoCodec.width(id) &&
        a.height == VideoCodec.height(id))
      val expectSum = (0 until VideoCodec.nFrames(id)).flatMap(f =>
        (0 until VideoCodec.frameSize(id, f)).map(j =>
          VideoCodec.frameByte(id, f, j).toLong)).sum
      assert(a.frame_byte_sum == expectSum)
      // corrupted RIFF size header
      val badSize = avi.clone(); badSize(4) = (badSize(4) ^ 0x01).toByte
      assert(!VideoCodec.aviChunkAudit(id, badSize).riff_ok)
      // truncated mid-idx1 with the RIFF header PATCHED — only the
      // per-chunk bounds check can catch the index promising entries
      // that never come
      val trunc = patchLen(avi.take(avi.length - 5))
      assert(!VideoCodec.aviChunkAudit(id, trunc).riff_ok)
      // trailing garbage, header patched — exact termination required
      val extra = patchLen(avi ++ Array[Byte](0, 0))
      assert(!VideoCodec.aviChunkAudit(id, extra).riff_ok)
      // skewed idx1 entry offset: container walks fine, index is a lie
      val frames = VideoCodec.nFrames(id)
      val badIdx = avi.clone()
      val entry0Off = badIdx.length - 16 * frames + 8
      badIdx(entry0Off) = (badIdx(entry0Off) ^ 0x01).toByte
      val i1 = VideoCodec.aviChunkAudit(id, badIdx)
      assert(i1.riff_ok && i1.avih_ok && !i1.idx_ok,
        s"expected index-only failure: $i1")
      // corrupted avih frame count: header no longer matches the walk
      val badAvih = avi.clone()
      badAvih(48) = (badAvih(48) ^ 0x01).toByte // avih.dwTotalFrames low byte
      val h1 = VideoCodec.aviChunkAudit(id, badAvih)
      assert(h1.riff_ok && !h1.avih_ok && h1.idx_ok,
        s"expected header-only failure: $h1")
      // flipped payload byte: the walk really reads the bytes
      val badPay = avi.clone()
      // first frame payload starts right after hdrl + movi LIST headers
      val payOff = 12 + 8 + 192 + 12 + 8
      badPay(payOff) = (badPay(payOff) ^ 0x40).toByte
      assert(VideoCodec.aviChunkAudit(id, badPay).frame_byte_sum
        != a.frame_byte_sum)
    }
  }
}
