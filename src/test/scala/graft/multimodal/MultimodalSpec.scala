package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

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
}
