package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing multimodal bundle, fully oracle-checked. `mm_features`'s
  * byte-level stub decode IS portable SQL: hex-encode the UTF-8 payload and
  * fold hex-digit pairs — byte `i` is
  * `16*hexval(hex[2i+1]) + hexval(hex[2i+2])` — through the same ascending
  * polynomial checksum / mean the JVM kernel runs ([[Multimodal.fakeDecode]]).
  */
object MultimodalSurface {

  /** 0-based byte list of `text`'s UTF-8 encoding, DuckDB-side. */
  private val bytesExpr =
    """list_transform(range(0, CAST(strlen(text) AS BIGINT)),
      |  i -> CAST(strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i+1 AS INT), 1)) - 1 AS BIGINT) * 16
      |     + CAST(strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i+2 AS INT), 1)) - 1 AS BIGINT))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media" -> ((s, d) =>
      Multimodal.deriveMedia(Tables.documents(s, d))
        .select(col("mediaId"), col("kind"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.sampleRate").cast("long").as("sample_rate"),
          col("meta.durationMs").cast("long").as("duration_ms"))
        .orderBy("mediaId")),
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(Multimodal.deriveMedia(Tables.documents(s, d)))
        .toDF().orderBy("mediaId")),
    // frame sampling over video payloads — frames surfaced as hex so the
    // oracle can slice the same bytes out of hex(encode(text))
    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.deriveMedia(Tables.documents(s, d)))
        .select(col("mediaId"), col("frameIdx").cast("long"),
          hex(col("frame")).as("frame_hex"),
          octet_length(col("frame")).cast("long").as("frame_len"))
        .orderBy("mediaId", "frameIdx")),
    // nearest-neighbor resize stub: image payloads keep every 4th byte and
    // scale their dims; audio/video pass through untouched
    "mm_resized" -> ((s, d) =>
      Multimodal.resize(Multimodal.deriveMedia(Tables.documents(s, d)), 4)
        .select(col("mediaId"), col("kind"),
          hex(col("payload")).as("payload_hex"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"))
        .orderBy("mediaId")),
    // batched embedding inference (StubEmbedder): vector dims surfaced as
    // named columns so the oracle compares scalars, not list encodings
    "mm_embed_batch" -> ((s, d) =>
      Multimodal.embedBatch(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id") +:
          (0 until Multimodal.StubEmbedder.dim).map(j =>
            element_at(col("embedding"), j + 1).as(s"v$j")): _*)
        .orderBy("doc_id")),
    // feature-hashing embedder through the same batching plumbing: signed
    // token counts per hashed dimension, L2-normalized (real vector math,
    // bit-reproduced by the oracle's identical integer + IEEE arithmetic)
    "mm_embed_hashtrick" -> ((s, d) =>
      Multimodal.embedBatch(Tables.documents(s, d), "doc_id", "text",
        Multimodal.HashingEmbedder(HtDim))
        .select(col("doc_id") +:
          (0 until HtDim).map(j =>
            element_at(col("embedding"), j + 1).as(s"v$j")): _*)
        .orderBy("doc_id")),
    // REAL codec round trip: WAV bytes written and re-parsed by javax.sound
    "mm_audio" -> (audioFeatures _),
  )

  /** Gate dimensionality for the hashing-trick embedder (small so the
    * oracle compares named scalar columns, like `mm_embed_batch`).
    */
  val HtDim = 8

  /** Deterministic PCM16 test signal for the audio gate: n = 64 + id%193
    * samples, s_i = ((id+1)·2654435761 + i·40503) mod 2¹⁶ − 2¹⁵ — all
    * positive-BIGINT arithmetic so the oracle reproduces it verbatim.
    */
  private[multimodal] def synthSamples(docId: Long): Array[Short] = {
    val n = 64 + (docId % 193).toInt
    Array.tabulate(n)(i =>
      ((((docId + 1) * 2654435761L + i * 40503L) % 65536L) - 32768L).toShort)
  }

  /** Real-container audio dataflow: synthesize PCM → wrap in a RIFF/WAVE
    * payload ([[WavCodec.synthWav]]) → re-parse through the actual
    * `javax.sound` reader ([[WavCodec.decodeSamples]]) → integer-exact
    * features (sample count, Σ|s|, zero crossings). The payload exists as
    * a genuine binary column between the two UDFs — the same shape as
    * bytes loaded from object storage — so the gate proves the decode
    * path, not just the arithmetic. Narrow per-row work, no shuffle until
    * the final sort.
    */
  private def audioFeatures(s: SparkSession, d: String): DataFrame = {
    val synth = udf((id: Long) => WavCodec.synthWav(synthSamples(id)))
    val stats = udf((payload: Array[Byte]) =>
      WavCodec.decodeSamples(payload).map { sm =>
        var sumAbs = 0L
        var zc = 0L
        var i = 0
        while (i < sm.length) {
          sumAbs += math.abs(sm(i).toLong)
          if (i > 0 && sm(i - 1) * sm(i) < 0) zc += 1
          i += 1
        }
        (sm.length.toLong, sumAbs, zc)
      })
    Tables.documents(s, d).filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), synth(col("doc_id")).as("wav"))
      .select(col("doc_id"),
        octet_length(col("wav")).cast("long").as("wav_bytes"),
        stats(col("wav")).as("st"))
      .select(col("doc_id"), col("wav_bytes"),
        col("st._1").as("n_samples"), col("st._2").as("sum_abs"),
        col("st._3").as("zero_crossings"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "mm_media" ->
      """SELECT doc_id AS mediaId,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 480 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate,
        |  CAST(doc_id % 10000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY mediaId""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id AS "mediaId",
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS "byteLen",
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), $bytesExpr),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS checksum,
        |  CASE WHEN strlen(text) = 0 THEN 0.0
        |       ELSE CAST(list_sum($bytesExpr) AS DOUBLE) / strlen(text) END AS "meanByte"
        |FROM documents ORDER BY "mediaId"""".stripMargin,
    // sampleFrames mirror: video docs, every 4th 64-byte block (block 0
    // always included), frameIdx = block/stride, bytes sliced from the hex
    "mm_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS m, hex(encode(text)) AS hx, strlen(text) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT m, unnest(range(0, greatest(n // 64 - 1, 0) + 1, 4)) AS blk, hx
        |  FROM v)
        |SELECT m AS "mediaId", blk // 4 AS "frameIdx",
        |  substr(hx, CAST(blk * 128 + 1 AS INT), 128) AS frame_hex,
        |  CAST(len(substr(hx, CAST(blk * 128 + 1 AS INT), 128)) // 2 AS BIGINT) AS frame_len
        |FROM f ORDER BY "mediaId", "frameIdx"""".stripMargin,
    // resize mirror: images keep hex pairs at byte offsets 0,4,8,…; dims
    // floor-divide with a floor of 1 (≡ Spark's truncated double division)
    "mm_resized" ->
      """SELECT doc_id AS "mediaId",
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN doc_id % 3 = 0 THEN
        |    array_to_string(list_transform(range(0, greatest(strlen(text), 1), 4),
        |      i -> substr(hex(encode(text)), CAST(i * 2 + 1 AS INT), 2)), '')
        |  ELSE hex(encode(text)) END AS payload_hex,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN greatest((doc_id % 640 + 1) // 4, 1)
        |       ELSE doc_id % 640 + 1 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN greatest((doc_id % 480 + 1) // 4, 1)
        |       ELSE doc_id % 480 + 1 END AS BIGINT) AS height
        |FROM documents ORDER BY "mediaId"""".stripMargin,
    // StubEmbedder mirror: h = first 48 md5 bits (12-hex-char fold) mod 997,
    // dim j = (h * (2j+3) % 997) / 997.0 — generated from the same dim
    // constant the Spark side uses
    "mm_embed_batch" -> s"""
      |WITH h48 AS (SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 13),
      |        i -> CAST(strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1 AS BIGINT))),
      |      (fa, fb) -> fa * 16 + fb) % 997 AS h
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, ${(0 until Multimodal.StubEmbedder.dim).map(j =>
          s"(h * ${2 * j + 3} % 997) / 997.0 AS v$j").mkString(", ")}
      |FROM h48 ORDER BY doc_id""".stripMargin,
    // HashingEmbedder mirror: per token h = first 48 md5 bits; dimension
    // j = h mod dim, sign = ±1 by (h // dim) mod 2; signed counts pivot to
    // columns, L2-normalized. A doc whose signed counts all cancel (or with
    // no tokens) embeds to the zero vector — the CASE/COALESCE pair below.
    "mm_embed_hashtrick" -> {
      val d = HtDim
      val cs = (0 until d)
      s"""WITH base AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(ntext, ' ')) AS tok
        |  FROM base WHERE ntext <> ''),
        |hs AS (SELECT doc_id, ${graft.dedup.DedupSurface.hexFoldSql("md5(tok)", 1)} AS h
        |  FROM toks),
        |agg AS (SELECT doc_id, CAST(h % $d AS INT) AS j,
        |    SUM(CASE WHEN (h // $d) % 2 = 0 THEN 1 ELSE -1 END) AS c
        |  FROM hs GROUP BY doc_id, j),
        |piv AS (SELECT doc_id,
        |    ${cs.map(j => s"SUM(CASE WHEN j = $j THEN c ELSE 0 END) AS c$j").mkString(", ")}
        |  FROM agg GROUP BY doc_id),
        |nrm AS (SELECT doc_id,
        |    ${cs.map(j => s"c$j").mkString(", ")},
        |    sqrt(CAST(${cs.map(j => s"c$j*c$j").mkString(" + ")} AS DOUBLE)) AS nn
        |  FROM piv)
        |SELECT b.doc_id,
        |  ${cs.map(j =>
            s"COALESCE(CASE WHEN nn > 0 THEN CAST(c$j AS DOUBLE) / nn END, 0.0) AS v$j")
            .mkString(", ")}
        |FROM base b LEFT JOIN nrm USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    // the engine's WAV payload is 44 header bytes + 2n PCM bytes; features
    // re-derive from the same generator formula — hash parity proves the
    // container round trip recovered every sample exactly
    "mm_audio" ->
      """WITH a AS (
        |  SELECT doc_id, 64 + doc_id % 193 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> ((doc_id + 1) * 2654435761 + i * 40503) % 65536 - 32768)
        |      AS sm
        |  FROM a)
        |SELECT doc_id, CAST(44 + 2 * n AS BIGINT) AS wav_bytes,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(sm, x -> abs(x))) AS BIGINT) AS sum_abs,
        |  CAST(COALESCE(list_sum(list_transform(range(1, n),
        |    i -> CASE WHEN sm[CAST(i AS INT)] * sm[CAST(i + 1 AS INT)] < 0
        |         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
        |FROM s ORDER BY doc_id""".stripMargin,
  )
}
