package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot diffing — the daily-delta audit between two versions of a
  * table (yesterday's corpus vs today's re-crawl, the pre/post state of a
  * mutation run): classify every key as added / removed / changed /
  * unchanged, with a content fingerprint as the change evidence. The
  * reference has no versioning story at all (mutations overwrite in
  * place); any pipeline that re-ingests needs this before trusting a
  * delta.
  *
  * Change detection hashes the compared columns (md5 over a
  * US-separated, null-sentineled concat — the same portable fingerprint
  * the BPE token gate uses), so the diff is one full outer join on the
  * key with single-pass hash compare: no column-by-column join
  * conditions, no skew beyond the key join itself, O(1) row state.
  */
object Snapshots {

  /** Portable row fingerprint over `cols` (null-safe: NULL and the empty
    * string hash differently via a sentinel prefix per column).
    */
  def rowFingerprint(cols: Seq[String]): Column =
    md5(concat_ws("\u001f",
      cols.map(c => when(col(c).isNull, lit("\u0000"))
        .otherwise(concat(lit("v"), col(c).cast("string")))): _*))

  /** One row per key present in either snapshot:
    * (key, change, old_fp, new_fp) with change in
    * added | removed | changed | unchanged.
    */
  def diffSnapshots(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(col(idCol).as("key"),
      rowFingerprint(compareCols).as("old_fp"))
    val n = newSnap.select(col(idCol).as("key"),
      rowFingerprint(compareCols).as("new_fp"))
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        col("old_fp"), col("new_fp"))
  }

  /** Gate's synthetic "today": every 7th doc's text is edited, every 13th
    * is dropped, and three fresh ids appear — deterministic in both
    * engines.
    */
  def gateNewSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [edited]")))
          .otherwise(col("text")))
      .unionByName(
        docs.orderBy("doc_id").limit(3)
          .select((col("doc_id") + 900000).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      diffSnapshots(docs, gateNewSnapshot(docs), "doc_id",
        Seq("text", "lang", "source"))
        .orderBy("key")
    }))

  private def fpSql(prefix: String): String =
    Seq("text", "lang", "source")
      .map(c => s"CASE WHEN $prefix$c IS NULL THEN chr(0) ELSE 'v' || CAST($prefix$c AS VARCHAR) END")
      .mkString("md5(concat_ws(chr(31), ", ", ", "))")

  val oracles: Map[String, String] = Map(
    "pipe_snapshot_diff" -> s"""
      |WITH newsnap AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]'
      |                      ELSE text END AS text, lang, source
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 900000, text, lang, source
      |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 3)),
      |o AS (SELECT doc_id AS key, ${fpSql("")} AS old_fp FROM documents),
      |n AS (SELECT doc_id AS key, ${fpSql("")} AS new_fp FROM newsnap)
      |SELECT COALESCE(o.key, n.key) AS key,
      |  CASE WHEN o.key IS NULL THEN 'added'
      |       WHEN n.key IS NULL THEN 'removed'
      |       WHEN old_fp <> new_fp THEN 'changed'
      |       ELSE 'unchanged' END AS change,
      |  old_fp, new_fp
      |FROM o FULL OUTER JOIN n ON o.key = n.key
      |ORDER BY key""".stripMargin)
}
