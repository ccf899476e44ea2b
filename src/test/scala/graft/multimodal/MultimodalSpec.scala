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
}
