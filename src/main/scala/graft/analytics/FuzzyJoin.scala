package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-string (edit-distance) join — entity resolution for dirty
  * keys: product names, author strings, OCR'd fields. The naive form is a
  * cartesian product with a levenshtein filter; at any real scale the win
  * is BLOCKING that provably loses no pair.
  *
  * Length blocking: strings within levenshtein distance d differ in length
  * by at most d. With cells of width d+1 (`cell = length div (d+1)`), two
  * strings within distance d land in the same or adjacent cells — so the
  * probe side explodes into {cell-1, cell, cell+1} and candidates come
  * from a plain equi-join on the cell id. Each corpus row carries ONE
  * cell, so no pair is generated twice and no dedup shuffle exists.
  *
  * Scale shape: the corpus never replicates; the (smaller, dirtier) probe
  * side triples. Shuffle keys are cell ids — skew only if the length
  * distribution is degenerate, and AQE splits a hot cell. Verification
  * (exact levenshtein) runs bucket-local on candidates only. Production
  * corpora add a q-gram prefix prefilter inside the cell to cut
  * candidates further; the contract (no false negatives) stays the same.
  */
object FuzzyJoin {

  val GateMaxDist = 2

  /** Pairs (probe, corpus) within levenshtein `maxDist`, with the exact
    * distance as evidence. Complete by the length-blocking argument above.
    */
  def editDistanceJoin(corpus: DataFrame, probes: DataFrame,
      corpusCol: String, probeCol: String, maxDist: Int): DataFrame = {
    val w = maxDist + 1
    val c = corpus.withColumn("cell", expr(s"length($corpusCol) div $w"))
    val p = probes
      .withColumn("cell0", expr(s"length($probeCol) div $w"))
      .withColumn("cell",
        explode(array(col("cell0") - 1, col("cell0"), col("cell0") + 1)))
      .drop("cell0")
    p.join(c, Seq("cell"))
      .withColumn("dist", levenshtein(col(probeCol), col(corpusCol)))
      .filter(col("dist") <= maxDist)
      .drop("cell")
  }

  /** Gate probes: every 10th part's name with one character deleted at a
    * key-derived position (never the first character) — a deterministic
    * "typo corpus" both engines rebuild identically.
    */
  def probeNames(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("probe_key"),
        expr("p_partkey % (length(p_name) - 2) + 2").as("k"),
        col("p_name"))
      .select(col("probe_key"),
        expr("concat(substring(p_name, 1, cast(k - 1 as int)), substr(p_name, cast(k + 1 as int)))")
          .as("probe"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> ((s, d) =>
      editDistanceJoin(
        Tables.part(s, d).select("p_partkey", "p_name"),
        probeNames(s, d), "p_name", "probe", GateMaxDist)
        .select("probe_key", "probe", "p_partkey", "p_name", "dist")
        .orderBy("probe_key", "p_partkey")))

  val oracles: Map[String, String] = Map(
    "q_fuzzy_join" -> s"""
      |WITH p0 AS (SELECT p_partkey AS probe_key,
      |    p_partkey % (length(p_name) - 2) + 2 AS k, p_name
      |  FROM part WHERE p_partkey % 10 = 0),
      |probes AS (SELECT probe_key,
      |    substr(p_name, 1, CAST(k - 1 AS INT)) || substr(p_name, CAST(k + 1 AS INT)) AS probe
      |  FROM p0),
      |pc AS (SELECT probe_key, probe,
      |    unnest([length(probe) // ${GateMaxDist + 1} - 1,
      |            length(probe) // ${GateMaxDist + 1},
      |            length(probe) // ${GateMaxDist + 1} + 1]) AS cell
      |  FROM probes),
      |c AS (SELECT p_partkey, p_name, length(p_name) // ${GateMaxDist + 1} AS cell
      |  FROM part)
      |SELECT probe_key, probe, p_partkey, p_name,
      |  CAST(levenshtein(probe, p_name) AS INT) AS dist
      |FROM pc JOIN c USING (cell)
      |WHERE levenshtein(probe, p_name) <= $GateMaxDist
      |ORDER BY probe_key, p_partkey""".stripMargin)
}
