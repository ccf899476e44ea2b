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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "txt_top_ngrams" -> ((s, d) =>
      Pipeline.topNgramsPerKey(docs(s, d), "lang", "text")
        .orderBy("key", "rank")),
    "pipe_split_leakproof" -> ((s, d) =>
      Pipeline.splitBySurvivor(DedupSurface.survivors(s, d))
        .orderBy("doc_id")),
  )

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

  /** SQL twin of `Pipeline.hashBucket(x, 1000)`: floorMod twice, with the
    * inner fold keeping the product under 2^62.
    */
  private def bucketSql(x: String): String =
    s"((($x % 2147483647 + 2147483647) % 2147483647) * 2654435761 % 1000 + 1000) % 1000"

  val oracles: Map[String, String] = Map(
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
    "txt_top_ngrams" -> s"""
      |WITH g AS (SELECT lang AS key, unnest(${gramsSql(2)}) AS gram FROM documents),
      |c AS (SELECT key, gram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1, 2),
      |r AS (SELECT key, gram, n,
      |        row_number() OVER (PARTITION BY key ORDER BY n DESC, gram ASC) AS rank
      |      FROM c)
      |SELECT key, gram, n, rank FROM r WHERE rank <= 10
      |ORDER BY key, rank""".stripMargin,
    "pipe_split_leakproof" -> (DedupSurface.survivorsCtes + s""",
      |surv AS (SELECT id AS doc_id, MIN(lab) AS survivor_id FROM reach GROUP BY id)
      |SELECT doc_id, survivor_id,
      |  CASE WHEN ${bucketSql("survivor_id")} < 800
      |       THEN 'train' ELSE 'test' END AS split
      |FROM surv ORDER BY doc_id""".stripMargin),
  )
}
