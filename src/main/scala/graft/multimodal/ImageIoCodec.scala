package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec behind [[Multimodal.MediaCodec]], JDK-only
  * (`javax.imageio` — no new dependencies): image payloads are actually
  * DECODED, not byte-folded. Slots into the same `extractFeatures` /
  * `resizeWith` pipelines as [[Multimodal.StubCodec]] — the swap the codec
  * boundary exists for.
  *
  *  - `decodeFeatures("image", png)` → (pixel count, mean BT.601 luma).
  *    The luma mean is computed from per-pixel integer per-mille weights
  *    (299·R + 587·G + 114·B summed in a Long) so it is deterministic and
  *    order-free.
  *  - `resizeImage` → area-averaged downscale via
  *    `Image.getScaledInstance`, re-encoded as PNG.
  *  - `sampleFrames` really decodes MULTI-FRAME payloads the JDK has a
  *    reader for (animated GIF), emitting every stride-th frame as PNG.
  *  - Audio/true-video payloads (and bytes ImageIO cannot decode) fall
  *    back to the stub's byte arithmetic: those formats need an
  *    ffmpeg-class dependency this environment forbids, and a mixed media
  *    table must keep flowing.
  *
  * ImageIO decoders are not thread-safe to SHARE but `ImageIO.read` creates
  * one per call; executors run tasks in parallel safely.
  */
object ImageIoCodec extends Multimodal.MediaCodec {

  private def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  override def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double) =
    (if (kind == "image") decode(payload) else None) match {
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        var lumaPerMille = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lumaPerMille += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        (n, if (n == 0) 0.0 else lumaPerMille.toDouble / 1000.0 / n)
      case None => Multimodal.StubCodec.decodeFeatures(kind, payload)
    }

  override def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] =
    decode(payload) match {
      case Some(img) =>
        val nw = math.max(img.getWidth / factor, 1)
        val nh = math.max(img.getHeight / factor, 1)
        val scaled = img.getScaledInstance(nw, nh, java.awt.Image.SCALE_AREA_AVERAGING)
        val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(scaled, 0, 0, null) finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      case None => Multimodal.StubCodec.resizeImage(payload, factor)
    }

  /** Real multi-frame decode where the JDK has a reader for it (animated
    * GIF: `ImageReader.getNumImages(true)` frames, `read(i)` each): every
    * `stride`-th frame is decoded and re-encoded as PNG — an actual
    * keyframe-sampling path, not byte blocks. `blockSize` is a byte-block
    * parameter and does not apply to decoded frames. Single-frame images
    * and payloads no installed reader handles (real video needs an
    * ffmpeg-class dependency this environment forbids) fall back to the
    * stub's byte arithmetic so a mixed media table keeps flowing.
    */
  override def sampleFrames(payload: Array[Byte], blockSize: Int,
      stride: Int): Seq[Array[Byte]] = {
    val frames =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        try {
          // null-check BEFORE getImageReaders: a null stream would throw
          // IllegalArgumentException, which the IOException catch below
          // does not cover
          val readers =
            if (iis == null) java.util.Collections.emptyIterator[javax.imageio.ImageReader]()
            else ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            reader.setInput(iis, false, true)
            try {
              val n = reader.getNumImages(true)
              if (n <= 1) None // single-frame: not a frame-sampling payload
              else Some((0 until n by math.max(stride, 1)).map { i =>
                val img = reader.read(i)
                val bos = new ByteArrayOutputStream()
                ImageIO.write(img, "png", bos)
                bos.toByteArray
              })
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch {
        // NonFatal, not just IOException: the JDK GIF plugin throws
        // RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
        // NegativeArraySize) on malformed/truncated multi-frame payloads,
        // and a corrupt payload must fall back to the stub — a mixed
        // media table keeps flowing, it never crashes the task
        case scala.util.control.NonFatal(_) => None
      }
    frames.getOrElse(
      Multimodal.StubCodec.sampleFrames(payload, blockSize, stride))
  }
}
