package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing multimodal bundle. `mm_media` (schema/metadata plumbing) is
  * fully oracle-checked; `mm_features` runs the binary mapPartitions decode
  * path, whose byte-level checksum isn't expressible in portable SQL — it
  * gets the rows-only check here and exact parity coverage in
  * `MultimodalSpec`.
  */
object MultimodalSurface {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media" -> ((s, d) =>
      Multimodal.deriveMedia(Tables.documents(s, d))
        .select(col("mediaId"), col("kind"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          col("meta.width"), col("meta.height"),
          col("meta.sampleRate").as("sample_rate"),
          col("meta.durationMs").as("duration_ms"))
        .orderBy("mediaId")),
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(Multimodal.deriveMedia(Tables.documents(s, d)))
        .toDF().orderBy("mediaId")),
  )

  val oracles: Map[String, String] = Map(
    "mm_media" ->
      """SELECT doc_id AS mediaId,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  CAST(doc_id % 640 + 1 AS INT) AS width,
        |  CAST(doc_id % 480 + 1 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(doc_id % 10000 AS INT) AS duration_ms
        |FROM documents ORDER BY mediaId""".stripMargin,
  )
}
