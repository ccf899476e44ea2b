package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing bundle for the text-analysis operators over `documents`. */
object TextSurface {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),
    "txt_langid" -> ((s, d) =>
      TextAnalysis.withLangId(docs(s, d))
        .select("doc_id", "lang", "pred_lang", "s_zh", "s_en", "s_fr", "s_es", "s_de")
        .orderBy("doc_id")),
    "txt_langid_confusion" -> ((s, d) =>
      TextAnalysis.withLangId(docs(s, d))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")),
    "txt_quality" -> ((s, d) =>
      TextAnalysis.withQuality(docs(s, d))
        .select("doc_id", "n_alpha", "n_punct", "n_tokens", "n_stop",
          "alpha_ratio", "punct_ratio", "stop_density", "len_norm", "quality")
        .orderBy("doc_id")),
    "txt_fingerprint" -> ((s, d) =>
      TextAnalysis.withFingerprints(docs(s, d))
        .select("doc_id", "fp_md5", "fp_shingle_min")
        .orderBy("doc_id")),
    "txt_salient_terms" -> ((s, d) =>
      TextAnalysis.topTermsPerDoc(docs(s, d), "doc_id", "text", 5)
        .orderBy("doc_id", "rank")),
  )

  private[graft] val padded = "' ' || lower(text) || ' '"
  private[graft] def occ(needle: String): String =
    s"(length($padded) - length(replace($padded, '$needle', ''))) // ${needle.length}"
  private[graft] def score(lang: String): String =
    TextAnalysis.stopwords(lang).map(occ).mkString("(", " + ", ")")
  // shared with the quality-aware survivor oracle in DedupSurface
  private[graft] val allStops =
    TextAnalysis.stopwords.keys.toSeq.sorted.flatMap(TextAnalysis.stopwords)
      .map(occ).mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(
    "txt_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_langid" -> s"""
        |WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS s_zh,
        |    CAST(${score("en")} AS BIGINT) AS s_en,
        |    CAST(${score("fr")} AS BIGINT) AS s_fr,
        |    CAST(${score("es")} AS BIGINT) AS s_es,
        |    CAST(${score("de")} AS BIGINT) AS s_de
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN s_zh > 0 THEN 'zh'
        |       WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_de THEN 'es'
        |       ELSE 'de' END AS pred_lang,
        |  s_zh, s_en, s_fr, s_es, s_de
        |FROM scored ORDER BY doc_id""".stripMargin,
    "txt_langid_confusion" -> s"""
        |WITH scored AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS s_zh,
        |    CAST(${score("en")} AS BIGINT) AS s_en,
        |    CAST(${score("fr")} AS BIGINT) AS s_fr,
        |    CAST(${score("es")} AS BIGINT) AS s_es,
        |    CAST(${score("de")} AS BIGINT) AS s_de
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN s_zh > 0 THEN 'zh'
        |       WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_de THEN 'es'
        |       ELSE 'de' END AS pred_lang,
        |  COUNT(*) AS n
        |FROM scored GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    "txt_quality" -> s"""
        |WITH feat AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_m,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
        |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |    CAST($allStops AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_alpha, n_punct, n_tokens, n_stop,
        |  n_alpha / n_chars_m AS alpha_ratio,
        |  n_punct / n_chars_m AS punct_ratio,
        |  least(n_stop * 10.0 / n_tokens, 1.0) AS stop_density,
        |  least(n_chars_m / 500.0, 1.0) AS len_norm,
        |  (n_alpha / n_chars_m) * 0.4 + least(n_stop * 10.0 / n_tokens, 1.0) * 0.3
        |    + (1.0 - n_punct / n_chars_m) * 0.2 + least(n_chars_m / 500.0, 1.0) * 0.1 AS quality
        |FROM feat ORDER BY doc_id""".stripMargin,
    "txt_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext
        |  FROM documents),
        |tok AS (SELECT doc_id, ntext, string_split(ntext, ' ') AS tokens FROM norm)
        |SELECT doc_id, md5(ntext) AS fp_md5,
        |  CASE WHEN len(tokens) >= 5
        |       THEN list_min(list_transform(range(1, len(tokens) - 3),
        |              i -> md5(array_to_string(list_slice(tokens, i, i + 4), ' '))))
        |       ELSE md5(ntext) END AS fp_shingle_min
        |FROM tok ORDER BY doc_id""".stripMargin,
    "txt_salient_terms" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM t GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        |r AS (SELECT doc_id, term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, term ASC) AS rank
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, rank, term, tf, df, n_docs
        |FROM r, nd WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
  )
}
