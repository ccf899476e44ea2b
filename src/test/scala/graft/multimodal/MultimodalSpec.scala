package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Batch-size recorder for the embedBatch plumbing spec. JVM-static queue:
  * task closures deserialize into the same local-mode JVM, so the driver
  * reads what executor tasks recorded.
  */
object RecordingEmbedder extends Multimodal.TextEmbedder {
  val dim = 4
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def embed(texts: Seq[String]): Seq[Array[Double]] = {
    sizes.add(texts.length)
    Multimodal.StubEmbedder.embed(texts)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.deriveMedia(Tables.documents(spark, sf0001)).cache()

  test("media schema: binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.count() === 500)
  }

  test("mapPartitions feature extraction matches a driver-side reference") {
    val got = Multimodal.extractFeatures(media)
      .collect().map(f => f.mediaId -> f).toMap
    val texts = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(got.size === texts.length)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      val (checksum, meanByte) = Multimodal.fakeDecode(bytes)
      val f = got(id)
      assert(f.byteLen === bytes.length.toLong, s"byteLen for $id")
      assert(f.checksum === checksum, s"checksum for $id")
      assert(f.meanByte === meanByte, s"meanByte for $id")
    }
  }

  test("resize downsamples image payloads and their metadata only") {
    val resized = Multimodal.resize(media, factor = 4)
    val img = resized.filter($"kind" === "image")
      .join(media.filter($"kind" === "image")
        .select($"mediaId", octet_length($"payload").as("orig_len"),
          $"meta.width".as("orig_w")), Seq("mediaId"))
    // every 4th byte kept (ceil), width scaled down
    assert(img.filter(octet_length($"payload") =!= ceil($"orig_len" / 4.0)).count() === 0)
    assert(img.filter($"meta.width" =!= greatest(floor($"orig_w" / 4.0), lit(1)).cast("int"))
      .count() === 0)
    // non-image payloads untouched
    val untouched = resized.filter($"kind" =!= "image")
      .join(media.select($"mediaId", $"payload".as("orig")), Seq("mediaId"))
    assert(untouched.filter($"payload" =!= $"orig").count() === 0)
  }

  test("frame sampling explodes video payloads into strided blocks") {
    val frames = Multimodal.sampleFrames(media, blockSize = 16, stride = 2)
    assert(frames.select($"mediaId").distinct().count() ===
      media.filter($"kind" === "video").count())
    // every frame except possibly the tail block is exactly blockSize bytes
    val sizes = frames.select(octet_length($"frame")).as[Int].collect()
    assert(sizes.forall(s => s > 0 && s <= 16))
    // deterministic: frameIdx 0 is the payload head
    val head = frames.filter($"mediaId" === 2 && $"frameIdx" === 0)
      .select($"frame".cast("string")).as[String].head()
    val full = media.filter($"mediaId" === 2)
      .select($"payload".cast("string")).as[String].head()
    assert(full.startsWith(head))
  }

  test("codec-backed operators with StubCodec are bit-identical to the expression forms") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"mediaId", $"payload".cast("string"), $"meta.width", $"meta.height")
        .as[(Long, String, Int, Int)].collect().toSet
    assert(rows(Multimodal.resizeWith(media, 4)) === rows(Multimodal.resize(media, 4)))
    def frows(df: org.apache.spark.sql.DataFrame) =
      df.select($"mediaId", $"frameIdx", $"frame".cast("string"))
        .as[(Long, Int, String)].collect().toSet
    assert(frows(Multimodal.sampleFramesWith(media, 16, 2)) ===
      frows(Multimodal.sampleFrames(media, 16, 2)))
    // extractFeatures default codec = StubCodec (the gate's path)
    val viaTrait = Multimodal.extractFeatures(media, Multimodal.StubCodec)
      .collect().toSet
    assert(viaTrait === Multimodal.extractFeatures(media).collect().toSet)
  }

  test("a second codec slots in without changing the pipeline shape") {
    // toy alternative: inverts every byte on decode paths — stands in for a
    // real JPEG/PCM decoder swapping into the same interface
    object InvertCodec extends Multimodal.MediaCodec {
      override def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double) = {
        val (c, m) = Multimodal.StubCodec.decodeFeatures(kind,
          payload.map(b => (~b).toByte))
        (c, m)
      }
      override def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] =
        Multimodal.StubCodec.resizeImage(payload.map(b => (~b).toByte), factor)
      override def sampleFrames(payload: Array[Byte], blockSize: Int,
          stride: Int): Seq[Array[Byte]] =
        Multimodal.StubCodec.sampleFrames(payload.map(b => (~b).toByte), blockSize, stride)
    }
    val a = Multimodal.resizeWith(media, 4, InvertCodec)
    val b = Multimodal.resizeWith(media, 4)
    // same schema and cardinality, same meta handling...
    assert(a.schema === b.schema)
    assert(a.count() === b.count())
    // ...different image payloads (the codec actually ran), identical
    // non-image payloads (kind routing unchanged)
    val joined = a.select($"mediaId", $"kind", $"payload".as("pa"))
      .join(b.select($"mediaId", $"payload".as("pb")), Seq("mediaId"))
    assert(joined.filter($"kind" === "image" && $"pa" === $"pb").count() === 0)
    assert(joined.filter($"kind" =!= "image" && $"pa" =!= $"pb").count() === 0)
    val fa = Multimodal.sampleFramesWith(media, 16, 2, InvertCodec)
    assert(fa.count() === Multimodal.sampleFrames(media, 16, 2).count())
    val feat = Multimodal.extractFeatures(media, InvertCodec).collect()
    val stub = Multimodal.extractFeatures(media).collect()
    assert(feat.map(_.mediaId).toSet === stub.map(_.mediaId).toSet)
    assert(feat.map(f => f.mediaId -> f.checksum).toMap !==
      stub.map(f => f.mediaId -> f.checksum).toMap)
  }

  test("ImageIoCodec decodes a real PNG through the same feature/resize pipelines") {
    // paint a known 8x6 image and PNG-encode it — a REAL image payload
    val w = 8; val h = 6
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var lumaPerMille = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (x * 30, y * 40, (x + y) * 10)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      lumaPerMille += 299L * r + 587L * g + 114L * b
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val audio = Array[Byte](1, 2, 3, 4)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, Multimodal.MediaMeta(w, h, 0, 0)),
      Multimodal.MediaRow(2L, "audio", audio, Multimodal.MediaMeta(0, 0, 16000, 1)))
      .toDS().toDF()

    // decode features: pixel count + mean BT.601 luma for the image; the
    // audio row falls back to the stub byte arithmetic
    val feats = Multimodal.extractFeatures(media, ImageIoCodec)
      .collect().map(f => f.mediaId -> f).toMap
    assert(feats(1L).byteLen === png.length.toLong)
    assert(feats(1L).checksum === w.toLong * h)
    assert(feats(1L).meanByte === lumaPerMille.toDouble / 1000.0 / (w * h))
    val (stubSum, stubMean) = Multimodal.StubCodec.decodeFeatures("audio", audio)
    assert(feats(2L).checksum === stubSum && feats(2L).meanByte === stubMean)

    // resize: the output payload is a real PNG at the scaled dimensions
    val resized = Multimodal.resizeWith(media, 2, ImageIoCodec)
    val outPng = resized.filter($"mediaId" === 1L)
      .select($"payload").as[Array[Byte]].head()
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outPng))
    assert(decoded.getWidth === w / 2 && decoded.getHeight === h / 2)
    assert(resized.filter($"mediaId" === 1L).select($"meta.width").as[Int].head() === w / 2)
    // non-image payloads untouched
    assert(resized.filter($"mediaId" === 2L).select($"payload").as[Array[Byte]]
      .head().toSeq === audio.toSeq)
  }

  test("WavCodec decodes a real WAV; JdkCodec routes image+audio to real decoders") {
    // synthesize a 100 Hz square wave: mean |amplitude| is EXACTLY amp/32768
    val rate = 8000f
    val n = 800
    val amp: Short = 12000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s: Short = if ((i / 40) % 2 == 0) amp else (-amp).toShort
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val (cnt, mean) = WavCodec.decodeFeatures("audio", wav)
    assert(cnt === n.toLong)
    assert(mean === amp.toDouble / 32768.0)

    // through the Spark pipeline, mixed with a non-decodable payload
    val junk = Array[Byte](9, 9, 9, 9)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, Multimodal.MediaMeta(0, 0, 8000, 1)),
      Multimodal.MediaRow(2L, "audio", junk, Multimodal.MediaMeta(0, 0, 0, 1)))
      .toDS().toDF()
    val feats = Multimodal.extractFeatures(media, JdkCodec)
      .collect().map(f => f.mediaId -> f).toMap
    assert(feats(1L).checksum === n.toLong)
    assert(feats(1L).meanByte === amp.toDouble / 32768.0)
    val (stubSum, stubMean) = Multimodal.StubCodec.decodeFeatures("audio", junk)
    assert(feats(2L).checksum === stubSum && feats(2L).meanByte === stubMean,
      "undecodable audio must fall back to the stub, not crash the batch")
  }

  test("ImageIoCodec samples REAL frames from an animated GIF; fallback intact") {
    // author a 5-frame animated GIF with the JDK's GIF sequence writer —
    // solid primary colors survive GIF palettization exactly
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val w = 10; val h = 7
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    val gif = bos.toByteArray

    // direct codec call: stride 2 over 5 frames → frames 0, 2, 4; each
    // output is a real PNG at the source dimensions with the planted color
    val frames = ImageIoCodec.sampleFrames(gif, 64, 2)
    assert(frames.length === 3)
    frames.zip(Seq(0xff0000, 0x0000ff, 0x000000)).foreach { case (png, c) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth === w && img.getHeight === h)
      assert((img.getRGB(w / 2, h / 2) & 0xffffff) === c)
    }
    // stride 1 keeps all 5
    assert(ImageIoCodec.sampleFrames(gif, 64, 1).length === 5)

    // through the Spark pipeline: the exploding (mediaId, frameIdx, frame)
    // shape, with a non-decodable video payload falling back to byte blocks
    val junk = Array.tabulate[Byte](256)(i => i.toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "video", gif, Multimodal.MediaMeta(w, h, 0, 5)),
      Multimodal.MediaRow(2L, "video", junk, Multimodal.MediaMeta(0, 0, 0, 0)))
      .toDS().toDF()
    val out = Multimodal.sampleFramesWith(media, 64, 2, ImageIoCodec)
      .select($"mediaId", $"frameIdx", $"frame")
      .as[(Long, Int, Array[Byte])].collect()
    assert(out.count(_._1 == 1L) === 3)
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 1, 2))
    val stubFrames = Multimodal.StubCodec.sampleFrames(junk, 64, 2)
    val gotJunk = out.filter(_._1 == 2L).sortBy(_._2).map(_._3.toSeq).toSeq
    assert(gotJunk === stubFrames.map(_.toSeq))

    // TRUNCATED multi-frame GIF: a valid GIF signature so a reader claims
    // it, but cut mid-stream — the JDK GIF plugin throws RuntimeExceptions
    // (not IOException) on such payloads, and the codec must fall back to
    // the stub instead of crashing the task
    for (cut <- Seq(16, 64)) {
      val truncated = gif.take(cut)
      assert(ImageIoCodec.sampleFrames(truncated, 64, 2).map(_.toSeq) ===
        Multimodal.StubCodec.sampleFrames(truncated, 64, 2).map(_.toSeq),
        s"truncated at $cut bytes must fall back to the stub")
    }
    // a mid-stream cut may still decode the complete leading frames (the
    // JDK reader salvages them) — the contract is only that it NEVER
    // throws, whatever the reader does with the tail
    (1 until gif.length).foreach { cut =>
      assert(ImageIoCodec.sampleFrames(gif.take(cut), 64, 2) != null)
    }
  }

  test("HashingEmbedder: unit vectors, reference arithmetic, layout invariance") {
    val emb = Multimodal.HashingEmbedder(8)
    // driver-side reference for one text: signed count per md5-hashed dim
    val text = "The quick  brown fox\tjumps over the LAZY dog"
    val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
    val ref = new Array[Long](8)
    toks.foreach { t =>
      val hh = graft.dedup.Dedup.md5Bits48Jvm(t)
      ref((hh % 8).toInt) += (if ((hh / 8) % 2 == 0) 1L else -1L)
    }
    val nrm = math.sqrt(ref.map(x => x * x).sum.toDouble)
    val got = emb.embed(Seq(text)).head
    assert(got.toSeq === ref.map(_.toDouble / nrm).toSeq)
    // unit norm (or exact zero for tokenless texts)
    assert(math.abs(got.map(x => x * x).sum - 1.0) < 1e-12)
    assert(emb.embed(Seq("   ")).head.toSeq === Seq.fill(8)(0.0))

    // same batching invariance contract as the stub (reused shape)
    val docs = (0L until 100L).map(i => (i, s"doc $i with words ${i % 7}"))
      .toDF("doc_id", "text")
    val a = Multimodal.embedBatch(docs.coalesce(1), "doc_id", "text", emb, 64)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])].collect().toMap
    val b = Multimodal.embedBatch(docs.repartition(7), "doc_id", "text", emb, 3)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])].collect().toMap
    assert(a === b)
  }

  test("embedBatch calls the model in bounded batches and is batch-size invariant") {
    val docs = (0L until 257L).map(i => (i, s"text number $i"))
      .toDF("doc_id", "text")
    RecordingEmbedder.sizes.clear()
    val out = Multimodal.embedBatch(docs.coalesce(2), "doc_id", "text",
      RecordingEmbedder, 64)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])]
      .collect().toMap
    assert(out.size === 257)
    // every batch bounded by batchSize, and no degenerate 1-row batches
    // except partition tails
    val sizes = RecordingEmbedder.sizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.forall(_ <= 64) && sizes.count(_ < 64) <= 2,
      s"batch sizes ${sizes.toSeq}")
    // batch-size and partitioning invariance: same vectors any layout
    val out2 = Multimodal.embedBatch(docs.repartition(7), "doc_id", "text",
      Multimodal.StubEmbedder, 5)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])]
      .collect().toMap
    assert(out2 === out)
    // null text carries no embedding
    val withNull = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Multimodal.embedBatch(withNull, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("synthWav ↔ decodeSamples: lossless PCM16 container round trip") {
    // edge amplitudes included: Short.MinValue has no positive negation
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345, 7)
    val wav = WavCodec.synthWav(samples)
    assert(WavCodec.decodeSamples(wav).get.toSeq === samples.toSeq)
    // the hand-rolled container is a real interchange WAV: javax.sound's
    // own parser reports the declared format
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate === 8000f &&
      in.getFormat.getSampleSizeInBits === 16 && !in.getFormat.isBigEndian)
    in.close()
    // empty stream round-trips too
    assert(WavCodec.decodeSamples(WavCodec.synthWav(Array.empty[Short]))
      .get.isEmpty)
    // cross-writer: AudioSystem.write's WAV of the same samples decodes to
    // the same values (container-parsing, not byte-layout luck)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (sm, i) =>
      pcm(2 * i) = (sm & 0xff).toByte
      pcm(2 * i + 1) = ((sm >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(WavCodec.decodeSamples(bos.toByteArray).get.toSeq === samples.toSeq)
  }

  test("mm_audio gate: partition-layout invariant, features match a driver re-derivation") {
    val gate = MultimodalSurface.queries("mm_audio")
    val out = gate(spark, sf0001)
      .select($"doc_id", $"n_samples", $"sum_abs", $"zero_crossings")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // driver-side reference from the same generator, through real decode
    out.take(20).foreach { case (id, n, sumAbs, zc) =>
      val sm = WavCodec.decodeSamples(
        WavCodec.synthWav(Array.tabulate((64 + id % 193).toInt)(i =>
          ((((id + 1) * 2654435761L + i * 40503L) % 65536L) - 32768L).toShort))).get
      assert(n === sm.length.toLong)
      assert(sumAbs === sm.map(x => math.abs(x.toLong)).sum)
      assert(zc === sm.sliding(2).count(p => p(0) * p(1) < 0).toLong)
    }
  }
}
