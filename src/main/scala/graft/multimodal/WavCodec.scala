package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Real audio codec behind [[Multimodal.MediaCodec]], JDK-only
  * (`javax.sound.sampled` — no new dependencies): WAV payloads are parsed
  * and their PCM frames actually decoded.
  *
  *  - `decodeFeatures("audio", wav)` → (sample count, mean |amplitude|
  *    normalized to [0, 1]). The mean accumulates |16-bit sample| in a
  *    Long, so it is exact, order-free and partition-independent — the
  *    same determinism contract every other engine feature keeps.
  *  - Supports the dominant interchange format (PCM_SIGNED 16-bit); other
  *    encodings and non-audio kinds fall back to [[Multimodal.StubCodec]]
  *    byte arithmetic so a mixed media table keeps flowing.
  *  - Image verbs delegate to [[ImageIoCodec]] — composing the two gives
  *    the full JDK-only codec ([[JdkCodec]]).
  *
  * `AudioSystem.getAudioInputStream` builds a fresh reader per call —
  * thread-safe under parallel executor tasks, like `ImageIO.read`.
  */
object WavCodec extends Multimodal.MediaCodec {

  /** Decoded 16-bit PCM frames via the real `javax.sound` parser; None if
    * the payload is not a PCM_SIGNED 16-bit stream. This is the parsed-
    * container path — header fields (endianness, data offset) come from
    * the codec, not from assumptions about the writer.
    */
  def decodeSamples(payload: Array[Byte]): Option[Array[Short]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val big = fmt.isBigEndian
          val out = new Array[Short](bytes.length / 2)
          var i = 0
          while (i + 1 < bytes.length) {
            out(i / 2) =
              if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            i += 2
          }
          Some(out)
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Minimal canonical RIFF/WAVE container around PCM_SIGNED 16-bit LE
    * mono samples — the writer half of the round trip `decodeSamples`
    * re-parses. Hand-rolled (44-byte header) so the bytes are
    * deterministic; `javax.sound` reads it back like any interchange WAV.
    */
  def synthWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** (sampleCount, sumAbs) over 16-bit PCM frames; None if not decodable. */
  private def pcmStats(payload: Array[Byte]): Option[(Long, Long)] =
    decodeSamples(payload).map { s =>
      (s.length.toLong, s.foldLeft(0L)((a, x) => a + math.abs(x.toLong)))
    }

  override def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double) =
    (if (kind == "audio") pcmStats(payload) else None) match {
      case Some((n, sumAbs)) =>
        (n, if (n == 0) 0.0 else sumAbs.toDouble / 32768.0 / n)
      case None => Multimodal.StubCodec.decodeFeatures(kind, payload)
    }

  override def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] =
    ImageIoCodec.resizeImage(payload, factor)

  override def sampleFrames(payload: Array[Byte], blockSize: Int,
      stride: Int): Seq[Array[Byte]] =
    Multimodal.StubCodec.sampleFrames(payload, blockSize, stride)
}

/** The composed JDK-only production codec: real image decode/resize
  * ([[ImageIoCodec]]), real WAV audio decode ([[WavCodec]]), stub video
  * frame sampling (video needs an ffmpeg-class dependency this
  * environment forbids — the one remaining production slot).
  */
object JdkCodec extends Multimodal.MediaCodec {
  override def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double) =
    kind match {
      case "audio" => WavCodec.decodeFeatures(kind, payload)
      case _ => ImageIoCodec.decodeFeatures(kind, payload)
    }
  override def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] =
    ImageIoCodec.resizeImage(payload, factor)
  override def sampleFrames(payload: Array[Byte], blockSize: Int,
      stride: Int): Seq[Array[Byte]] =
    ImageIoCodec.sampleFrames(payload, blockSize, stride)
}
