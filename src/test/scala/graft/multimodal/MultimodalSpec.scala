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
}
