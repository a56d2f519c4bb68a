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
}
