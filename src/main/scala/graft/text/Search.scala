package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Inverted-index build and conjunctive keyword search over `documents` —
  * the text-retrieval surface a corpus engine needs next to fuzzy dedup and
  * salient terms (the reference has no search; its only text access is
  * whole-value log salvage, `/root/reference/code/logSalvager.py`).
  *
  * Tokenization is [[TextAnalysis.normalized]] + single-space split — the
  * exact twin of the `ntext` fragment every text oracle uses, so results
  * are engine-reproducible and all ranking arithmetic stays in integers.
  */
object Search {

  /** Query used by the gate: three common corpus terms, conjunctive. */
  val GateTerms: Seq[String] = Seq("hash", "join", "scan")
  val GateK = 20

  /** The inverted index as data: one row per (term, doc_id) posting with
    * its term frequency. ONE shuffle on (term, doc_id); at 100 TB this is
    * the thing you'd write bucketed by term so searches are
    * shuffle-free scans of a few buckets.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), explode(split(col("ntext"), " ")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) keyword search: documents containing EVERY query
    * term, ranked by total query-term frequency (desc, doc_id tiebreak),
    * top `k`. Returns (rank, doc_id, score).
    *
    * Plan shape: the explode+filter keeps only query-term postings (the
    * token stream shrinks to ~|terms|/|vocab| of itself before the first
    * exchange), the per-doc aggregate is partial (map-side combined), and
    * the global top-k is TakeOrderedAndProject — per-partition heaps, NO
    * global sort of the scored set (spec-asserted). A 100 TB corpus search
    * is a scan + one small shuffle + a k-row driver result.
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    val scored = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), explode(split(col("ntext"), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count_distinct(col("term")).as("nt"), count(lit(1)).as("score"))
      .filter(col("nt") === terms.size)
      .select("doc_id", "score")

    // orderBy+limit lowers to TakeOrderedAndProject; the rank window then
    // runs over only the k surviving rows
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("rank", "doc_id", "score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_search" -> ((s, d) =>
      searchTopK(Tables.documents(s, d), "doc_id", "text", GateTerms, GateK)
        .orderBy("rank")))

  private val termList = GateTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  val oracles: Map[String, String] = Map(
    "txt_search" -> s"""
      |WITH norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |t AS (SELECT doc_id, unnest(string_split(ntext, ' ')) AS term
      |      FROM norm WHERE ntext <> ''),
      |f AS (SELECT doc_id, term FROM t WHERE term IN $termList),
      |d AS (SELECT doc_id, COUNT(DISTINCT term) AS nt,
      |        CAST(COUNT(*) AS BIGINT) AS score
      |      FROM f GROUP BY doc_id),
      |r AS (SELECT doc_id, score,
      |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      |      FROM d WHERE nt = ${GateTerms.size})
      |SELECT rank, doc_id, score FROM r WHERE rank <= $GateK
      |ORDER BY rank""".stripMargin)
}
