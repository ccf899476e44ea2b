package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupSurface

/** Driver-facing bundle for the corpus-preparation operators.
  *
  * The decontamination gate plants real leakage the way it happens in
  * practice — benchmark texts verbatim inside the training corpus — by
  * re-id'ing every eval doc into the train side at +300000, exactly the
  * DedupSurface augmentation style; the oracle derives the identical
  * train/eval split in SQL.
  */
object PipelineSurface {

  private def docs(s: SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))

  /** Train side: every non-eval doc, plus each eval doc leaked verbatim. */
  private def trainSide(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    all.filter(col("doc_id") % 20 =!= 0)
      .unionByName(all.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 300000).as("doc_id"), col("text"), col("lang")))
  }

  private def evalSide(s: SparkSession, d: String): DataFrame =
    docs(s, d).filter(col("doc_id") % 20 === 0)

  /** Per-language sampling rates (per mille) for the stratified-sample gate:
    * downsample the over-represented languages, keep the tail — the
    * rebalancing move every multilingual corpus build makes.
    */
  val SampleRates: Map[String, Int] =
    Map("en" -> 500, "fr" -> 400, "es" -> 300, "de" -> 200, "zh" -> 100)

  /** PII-planted corpus for the redaction gate: the synthetic documents
    * carry no PII, so the gate plants it deterministically — emails on
    * every doc_id%3, phone+IP on every doc_id%5 — the same augmentation
    * style the decontamination gate uses for leakage. The oracle builds the
    * identical corpus in SQL.
    */
  private def piiDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-867-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" or ping 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 today"))).otherwise(lit(""))).as("text"))

  /** Boilerplate span for the span-dedup gate: planted at the END of every
    * doc_id%4 doc and the FRONT of every doc_id%7 doc — the same repeated
    * text at two different offsets, which is exactly the case fixed-offset
    * chunking misses and content-defined chunking catches. The oracle
    * builds the identical corpus in SQL from this constant.
    */
  val BoilerplateSpan =
    "please subscribe to our newsletter for daily updates and breaking alerts"

  private def spanDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      concat(
        when(col("doc_id") % 7 === 0, lit(BoilerplateSpan + " "))
          .otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" " + BoilerplateSpan))
          .otherwise(lit(""))).as("text"))

  /** Relative mixture weights for the mixture-sample gate: skew the kept
    * corpus toward the low-numbered sources (the uniform 20-source synthetic
    * corpus makes every stratum a potential bottleneck, so the floor-div
    * unit arithmetic is exercised on every branch).
    */
  val MixtureWeights: Map[String, Int] =
    Map("src0" -> 8, "src1" -> 5, "src2" -> 4, "src3" -> 2, "src4" -> 1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_redact_pii" -> ((s, d) =>
      Pipeline.redactPii(piiDocs(s, d), "doc_id", "text")
        .orderBy("doc_id")),
    "pipe_repetition" -> ((s, d) =>
      Pipeline.repetitionFilter(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),
    "pipe_mixture" -> ((s, d) =>
      Pipeline.mixtureSample(Tables.documents(s, d), "doc_id", "source", MixtureWeights)
        .select("doc_id", "source", "bucket", "rate")
        .orderBy("doc_id")),
    "pipe_corpus_report" -> ((s, d) =>
      Pipeline.corpusReport(Tables.documents(s, d), "doc_id", "text", "source")
        .orderBy("source")),
    "pipe_decontaminate" -> ((s, d) =>
      Pipeline.decontaminate(trainSide(s, d), evalSide(s, d), "doc_id", "text")
        .orderBy("doc_id")),
    "pipe_stratified_sample" -> ((s, d) =>
      Pipeline.stratifiedSample(docs(s, d), "doc_id", "lang", SampleRates)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")),
    "pipe_pack_sequences" -> ((s, d) =>
      Pipeline.packSequences(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),
    // deterministic epoch shuffle: exact global positions under a seeded
    // portable hash, assigned by prefix-sum ranking (no global window)
    "pipe_shuffle_corpus" -> ((s, d) =>
      Pipeline.shuffleCorpus(
        Tables.documents(s, d).select(col("doc_id")), "doc_id", "epoch0")
        .orderBy("doc_id")),
    "pipe_domain_cap" -> ((s, d) =>
      Pipeline.capPerSource(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source", 10)
        .orderBy("source", "rank")),
    "pipe_chunk_overlap" -> ((s, d) =>
      Pipeline.chunkDocuments(docs(s, d), "doc_id", "text")
        .orderBy("doc_id", "chunk_id")),
    "txt_top_ngrams" -> ((s, d) =>
      Pipeline.topNgramsPerKey(docs(s, d), "lang", "text")
        .orderBy("key", "rank")),
    "pipe_split_leakproof" -> ((s, d) =>
      Pipeline.splitBySurvivor(DedupSurface.survivors(s, d))
        .orderBy("doc_id")),
    "pipe_dedup_spans" -> ((s, d) =>
      Pipeline.dedupSpans(spanDocs(s, d), "doc_id", "text")
        .orderBy("doc_id")),
    "pipe_sample_exact_n" -> ((s, d) =>
      Pipeline.samplePerStratum(Tables.documents(s, d)
          .select("doc_id", "source"), "doc_id", "source", 20)
        .orderBy("source", "rank")),
    // systematic PPS: every doc whose weight interval contains a multiple
    // of the stride — inclusion ∝ n_chars, deterministic on any layout
    "pipe_sample_pps" -> ((s, d) =>
      Pipeline.ppsSample(Tables.documents(s, d).select("doc_id", "n_chars"),
        "doc_id", "n_chars", PpsStride)
        .orderBy("doc_id")),
    // k-anonymity/l-diversity audit over quasi-identifiers (nation,
    // segment, balance band); sensitive attribute = in-debt flag
    "pipe_kanonymity" -> ((s, d) =>
      Pipeline.kAnonymityReport(
        Tables.customer(s, d)
          .select(col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_mktsegment"),
            expr("CAST(floor(c_acctbal / 2000) AS BIGINT)").as("bal_band"),
            (col("c_acctbal") < 0).as("in_debt")),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), "in_debt", KAnonK)
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")),
  )

  /** k-anonymity gate threshold. */
  val KAnonK = 5

  /** PPS stride: ~1/2048 of the corpus character mass per pick; all gate
    * weights sit far below it, so no certainty selections.
    */
  val PpsStride = 2048L

  // ---- DuckDB fragments mirroring the Scala expressions ----

  private val ntext = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** Word n-gram list with the short-doc whole-text fallback — the SQL twin
    * of `Dedup.ngrams(text, n)`.
    */
  private def gramsSql(n: Int): String =
    s"""CASE WHEN text IS NULL THEN CAST([] AS VARCHAR[])
       |     WHEN len(string_split($ntext, ' ')) >= $n
       |     THEN list_transform(range(1, len(string_split($ntext, ' ')) - ${n - 2}),
       |            i -> array_to_string(list_slice(string_split($ntext, ' '), i, i + ${n - 1}), ' '))
       |     ELSE [$ntext] END""".stripMargin

  private val trainCte =
    """train AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
      |  UNION ALL
      |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 20 = 0
      |)""".stripMargin

  private val rateSql = SampleRates.toSeq.sortBy(_._1)
    .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
    .mkString("CASE ", " ", " ELSE 0 END")

  /** SQL twin of `Pipeline.hashBucket(x, denom)`: floorMod twice, with the
    * inner fold keeping the product under 2^62.
    */
  private def bucketSqlD(x: String, denom: Long): String =
    s"((($x % 2147483647 + 2147483647) % 2147483647) * 2654435761 % $denom + $denom) % $denom"

  private def bucketSql(x: String): String = bucketSqlD(x, 1000L)

  /** SQL twin of [[piiDocs]] — continuation lines never START with `||`
    * (stripMargin would eat one pipe), so the concat operator trails.
    */
  private val piiAugSql =
    """aug AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
      |       '@mail.example.com now' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-' ||
      |       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' or ping 10.0.' ||
      |       CAST(doc_id % 256 AS VARCHAR) || '.7 today' ELSE '' END AS text
      |FROM documents)""".stripMargin

  // redaction chain + per-category counts generated from the SAME
  // PiiPatterns constants the Spark side uses — no drift possible
  private val redactedSql = Pipeline.PiiPatterns.foldLeft("text") {
    case (acc, (_, p, tok)) => s"regexp_replace($acc, '$p', '$tok', 'g')"
  }
  private val piiCountCols = Pipeline.PiiPatterns.map { case (name, p, _) =>
    s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$name"
  }.mkString(", ")

  private val mixtureWSql = MixtureWeights.toSeq.sortBy(_._1)
    .map { case (src, w) => s"('$src', $w)" }.mkString(", ")

  // language-id CASE chain built from the SAME stopword fragments the
  // txt_langid oracle uses (graft.text.TextSurface)
  private val langScoredCte = s"""scored AS (
    |  SELECT doc_id,
    |    CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS s_zh,
    |    CAST(${graft.text.TextSurface.score("en")} AS BIGINT) AS s_en,
    |    CAST(${graft.text.TextSurface.score("fr")} AS BIGINT) AS s_fr,
    |    CAST(${graft.text.TextSurface.score("es")} AS BIGINT) AS s_es,
    |    CAST(${graft.text.TextSurface.score("de")} AS BIGINT) AS s_de
    |  FROM documents)""".stripMargin

  private val predLangCase =
    """CASE WHEN s_zh > 0 THEN 'zh'
      |     WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
      |     WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |     WHEN s_es >= s_de THEN 'es'
      |     ELSE 'de' END""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_redact_pii" -> s"""WITH $piiAugSql
      |SELECT doc_id, $redactedSql AS redacted, $piiCountCols
      |FROM aug ORDER BY doc_id""".stripMargin,
    "pipe_repetition" -> s"""
      |WITH t AS (SELECT doc_id, unnest(string_split($ntext, ' ')) AS tok FROM documents),
      |c AS (SELECT doc_id, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
      |a AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
      |        CAST(COUNT(*) AS BIGINT) AS n_distinct, CAST(MAX(n) AS BIGINT) AS max_tok
      |      FROM c GROUP BY doc_id),
      |g AS (SELECT doc_id, unnest(${gramsSql(2)}) AS gram FROM documents),
      |gc AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2),
      |b AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |        CAST(MAX(n) AS BIGINT) AS max_bigram
      |      FROM gc GROUP BY doc_id)
      |SELECT a.doc_id, n_tokens, n_distinct,
      |  n_distinct / n_tokens AS distinct_ratio,
      |  max_tok / n_tokens AS top_token_frac,
      |  max_bigram / n_bigrams AS top_bigram_frac,
      |  (n_distinct / n_tokens >= 0.35 AND max_bigram / n_bigrams < 0.08) AS keep
      |FROM a JOIN b USING (doc_id) ORDER BY doc_id""".stripMargin,
    "pipe_mixture" -> s"""
      |WITH w(source, w_s) AS (VALUES $mixtureWSql),
      |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
      |j AS (SELECT c.source, n_s, CAST(w_s AS BIGINT) AS w_s FROM c JOIN w USING (source)),
      |u AS (SELECT MIN(n_s // w_s) AS m_units FROM j),
      |r AS (SELECT source, LEAST(1000, (m_units * w_s * 1000) // n_s) AS rate FROM j, u)
      |SELECT d.doc_id, d.source, ${bucketSql("doc_id")} AS bucket, rate
      |FROM documents d JOIN r USING (source)
      |WHERE ${bucketSql("doc_id")} < rate
      |ORDER BY doc_id""".stripMargin,
    "pipe_decontaminate" -> s"""WITH $trainCte,
      |tg AS (SELECT doc_id, unnest(list_distinct(${gramsSql(3)})) AS gram FROM train),
      |eg AS (SELECT DISTINCT gram FROM (
      |         SELECT unnest(list_distinct(${gramsSql(3)})) AS gram
      |         FROM documents WHERE doc_id % 20 = 0))
      |SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM tg JOIN eg USING (gram)
      |GROUP BY tg.doc_id ORDER BY doc_id""".stripMargin,
    "pipe_stratified_sample" -> s"""
      |SELECT doc_id, lang, ${bucketSql("doc_id")} AS bucket
      |FROM documents
      |WHERE ${bucketSql("doc_id")} < ($rateSql)
      |ORDER BY doc_id""".stripMargin,
    "pipe_shuffle_corpus" -> """
      |SELECT doc_id,
      |  ROW_NUMBER() OVER (
      |    ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
      |    AS shuffle_pos
      |FROM documents ORDER BY doc_id""".stripMargin,
    "pipe_pack_sequences" -> """
      |WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    doc_id % 8 AS shard
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
      |  FROM t)
      |SELECT doc_id, shard, n_tokens, tok_offset AS "offset",
      |  tok_offset // 256 AS first_window,
      |  ((tok_offset + n_tokens - 1) // 256) - (tok_offset // 256) + 1 AS n_windows
      |FROM o ORDER BY doc_id""".stripMargin,
    "pipe_chunk_overlap" -> """
      |WITH norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks
      |       FROM norm WHERE ntext <> ''),
      |st AS (SELECT doc_id, toks,
      |    CASE WHEN len(toks) > 40
      |         THEN (CAST(len(toks) AS BIGINT) - 40 + 30 - 1) // 30
      |         ELSE 0 END AS extra
      |  FROM tk),
      |ch AS (SELECT doc_id, toks, unnest(range(0, extra + 1)) AS chunk_id
      |       FROM st),
      |w AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |        toks[(chunk_id * 30 + 1):(chunk_id * 30 + 40)] AS ctoks
      |      FROM ch)
      |SELECT doc_id, chunk_id, CAST(len(ctoks) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(ctoks, ' ')) AS chunk_md5
      |FROM w ORDER BY doc_id, chunk_id""".stripMargin,
    "txt_top_ngrams" -> s"""
      |WITH g AS (SELECT lang AS key, unnest(${gramsSql(2)}) AS gram FROM documents),
      |c AS (SELECT key, gram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1, 2),
      |r AS (SELECT key, gram, n,
      |        row_number() OVER (PARTITION BY key ORDER BY n DESC, gram ASC) AS rank
      |      FROM c)
      |SELECT key, gram, n, rank FROM r WHERE rank <= 10
      |ORDER BY key, rank""".stripMargin,
    "pipe_domain_cap" -> s"""
      |WITH p AS (SELECT doc_id, source,
      |    ${bucketSqlD("doc_id", 1000000L)} AS priority FROM documents),
      |r AS (SELECT doc_id, source, priority,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY priority ASC, doc_id ASC) AS rank
      |      FROM p)
      |SELECT doc_id, source, priority, rank FROM r WHERE rank <= 10
      |ORDER BY source, rank""".stripMargin,
    "pipe_corpus_report" -> s"""
      |WITH feat AS (SELECT doc_id, source,
      |    CAST(length(text) AS BIGINT) AS n_chars_m,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |rt AS (SELECT doc_id, unnest(string_split($ntext, ' ')) AS tok FROM documents),
      |rc AS (SELECT doc_id, tok, COUNT(*) AS n FROM rt GROUP BY 1, 2),
      |ra AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS rn_tokens,
      |        CAST(COUNT(*) AS BIGINT) AS rn_distinct
      |      FROM rc GROUP BY doc_id),
      |rg AS (SELECT doc_id, unnest(${gramsSql(2)}) AS gram FROM documents),
      |rgc AS (SELECT doc_id, gram, COUNT(*) AS n FROM rg GROUP BY 1, 2),
      |rb AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS rn_bigrams,
      |        CAST(MAX(n) AS BIGINT) AS rmax_bigram
      |      FROM rgc GROUP BY doc_id),
      |keepj AS (SELECT ra.doc_id,
      |        (rn_distinct / rn_tokens >= 0.35 AND rmax_bigram / rn_bigrams < 0.08) AS keep
      |      FROM ra JOIN rb USING (doc_id)),
      |$langScoredCte,
      |pred AS (SELECT doc_id, $predLangCase AS pred_lang FROM scored),
      |base AS (SELECT f.*, k.keep, p.pred_lang
      |      FROM feat f JOIN keepj k USING (doc_id) JOIN pred p USING (doc_id)),
      |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |        CAST(SUM(n_alpha) AS BIGINT) AS a, CAST(SUM(n_chars_m) AS BIGINT) AS c,
      |        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |      FROM base GROUP BY source),
      |lc AS (SELECT source, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM base GROUP BY 1, 2),
      |lt AS (SELECT source, pred_lang AS top_lang, n AS top_lang_n,
      |        row_number() OVER (PARTITION BY source ORDER BY n DESC, pred_lang ASC) AS rk
      |      FROM lc)
      |SELECT agg.source, n_docs, n_tokens,
      |  n_tokens / n_docs AS tokens_per_doc,
      |  a / c AS alpha_ratio,
      |  kept / n_docs AS kept_frac,
      |  top_lang, top_lang_n
      |FROM agg JOIN lt USING (source) WHERE rk = 1 ORDER BY source""".stripMargin,
    "pipe_split_leakproof" -> (DedupSurface.survivorsCtes + s""",
      |surv AS (SELECT id AS doc_id, MIN(lab) AS survivor_id FROM reach GROUP BY id)
      |SELECT doc_id, survivor_id,
      |  CASE WHEN ${bucketSql("survivor_id")} < 800
      |       THEN 'train' ELSE 'test' END AS split
      |FROM surv ORDER BY doc_id""".stripMargin),
    "pipe_dedup_spans" -> s"""
      |WITH aug AS (SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN '$BoilerplateSpan ' ELSE '' END ||
      |    text ||
      |    CASE WHEN doc_id % 4 = 0 THEN ' $BoilerplateSpan' ELSE '' END AS text
      |  FROM documents),
      |tok AS (SELECT doc_id,
      |    unnest(string_split($ntext, ' ')) AS tok,
      |    generate_subscripts(string_split($ntext, ' '), 1) - 1 AS pos
      |  FROM aug),
      |b AS (SELECT doc_id, pos, tok,
      |    CASE WHEN ${DedupSurface.hexFoldSql("md5(tok)", 1)}
      |         % ${Pipeline.CdcBoundaryMod} = 0 THEN 1 ELSE 0 END AS is_b
      |  FROM tok),
      |cn AS (SELECT doc_id, pos, tok,
      |    CAST(COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_no
      |  FROM b),
      |ch AS (SELECT doc_id, chunk_no, string_agg(tok, ' ' ORDER BY pos) AS chunk
      |  FROM cn GROUP BY 1, 2),
      |rk AS (SELECT doc_id, chunk_no, chunk,
      |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_no) AS rk
      |  FROM ch),
      |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM ch GROUP BY 1),
      |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(chunk, ' ' ORDER BY chunk_no) AS text
      |  FROM rk WHERE rk = 1 GROUP BY doc_id)
      |SELECT t.doc_id, n_chunks, COALESCE(n_kept, 0) AS n_kept,
      |  COALESCE(reb.text, '') AS text
      |FROM tot t LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin,
    "pipe_sample_exact_n" -> s"""
      |WITH h AS (SELECT doc_id, source,
      |    ${bucketSqlD("doc_id", 1L << 20)} AS hkey
      |  FROM documents),
      |r AS (SELECT doc_id, source, hkey,
      |    row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rank
      |  FROM h)
      |SELECT doc_id, source, hkey, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 20 ORDER BY source, rank""".stripMargin,
    "pipe_kanonymity" -> s"""
      |WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |    c_mktsegment,
      |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
      |    c_acctbal < 0 AS in_debt
      |  FROM customer),
      |pv AS (SELECT c_nationkey, c_mktsegment, bal_band, in_debt,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM b GROUP BY 1, 2, 3, 4)
      |SELECT c_nationkey, c_mktsegment, bal_band,
      |  CAST(SUM(n_rows) AS BIGINT) AS class_size,
      |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
      |  SUM(n_rows) < $KAnonK AS k_violation,
      |  COUNT(*) < 2 AS l_violation
      |FROM pv GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin,
    // the distributed prefix sum re-derived as a plain window cumsum —
    // what globalPrefixSum replaces at scale
    "pipe_sample_pps" -> s"""
      |WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
      |    CAST(SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
      |  FROM documents)
      |SELECT doc_id, w, cumw FROM c
      |WHERE cumw // $PpsStride > (cumw - w) // $PpsStride
      |ORDER BY doc_id""".stripMargin,
  )
}
