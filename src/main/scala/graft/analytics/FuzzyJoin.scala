package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * Kept as the reference/fallback form: the cell key degenerates when the
    * length distribution is narrow (a real corpus of ~30-char product names
    * has ~6 distinct cells, so the "blocked" join is nearly cartesian —
    * 25.6 s at sf0.1). [[editDistanceJoinSegments]] is the production path.
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
      // banded threshold form: O(maxDist * n) per pair and early exit,
      // returns -1 above the threshold
      .withColumn("dist", levenshtein(col(probeCol), col(corpusCol), maxDist))
      .filter(col("dist") >= 0)
      .drop("cell")
  }

  /** Segment (PassJoin-style) blocking: every corpus string splits into
    * `maxDist + 1` contiguous segments (earlier segments shorter on
    * uneven splits — fixed convention); at most `maxDist` edits can touch
    * at most `maxDist` segments, so for any pair within the distance at
    * least ONE corpus segment occurs VERBATIM in the probe, at a start
    * position shifted by at most `maxDist` (Li et al., PassJoin, public
    * technique). The probe side therefore explodes to its candidate
    * (corpus-length, segment-index, shifted-substring) keys and candidates
    * come from an equi-join on the segment VALUE — content blocking, which
    * stays selective when every string has the same length and the cell
    * key collapses.
    *
    * Scale shape: the whole match runs on DISTINCT strings — duplicated
    * values (replicated catalogs, re-ingested batches) multiply ONLY the
    * final fan-out joins, never the candidate join, whose volume would
    * otherwise grow quadratically in the duplication factor (the 10×
    * probe, where every name has 10 copies on each side, ran 100× the
    * pair work before this collapse: 529 s → see SCALE_PROBE.md). On the
    * distinct strings: corpus emits maxDist+1 rows, probes O(maxDist³)
    * rows — constant fan-outs, one equi-join keyed on the segment VALUE, a
    * distinct on the (probe, corpus) string pair (multiple segments can
    * witness the same pair), exact levenshtein on survivors, then two
    * string-keyed joins fan the verified pairs back out to the original
    * rows. Corpus strings shorter than maxDist+1 chars can't host the
    * segments and are routed through the cell join (completeness
    * preserved). Corpus and probe column names must not overlap.
    */
  def editDistanceJoinSegments(corpus: DataFrame, probes: DataFrame,
      corpusCol: String, probeCol: String, maxDist: Int): DataFrame = {
    val parts = maxDist + 1
    // segment bounds for a length-l corpus string: base = l div parts with
    // the last (l mod parts) segments one longer; seg i (0-based) starts at
    // 1 + i*base + max(0, i - (parts - rem)) — all expressible per row
    def segLen(l: Column, i: Int): Column = {
      val baseF = floor(l / lit(parts)).cast("long")
      val rem = l.cast("long") % parts
      baseF + when(lit(i) >= lit(parts) - rem, 1L).otherwise(0L)
    }
    def segStart(l: Column, i: Int): Column = {
      val baseF = floor(l / lit(parts)).cast("long")
      val rem = l.cast("long") % parts
      // start = 1 + sum of lengths of segments 0..i-1
      lit(1L) + lit(i) * baseF +
        greatest(lit(0L), lit(i) - (lit(parts.toLong) - rem))
    }

    // collapse exact duplicates FIRST: all blocking/verification runs on
    // distinct strings, duplication only multiplies the final fan-out
    val cDist = corpus.select(col(corpusCol)).distinct()
    val pDist = probes.select(col(probeCol)).distinct()

    val longCorpus = cDist.filter(length(col(corpusCol)) >= parts)
    val shortCorpus = cDist.filter(length(col(corpusCol)) < parts)

    val cSegs = (0 until parts).map { i =>
      val l = length(col(corpusCol)).cast("long")
      longCorpus.select(col("*"),
        l.as("cl"), lit(i).as("si"),
        substring(col(corpusCol), segStart(l, i).cast("int"),
          segLen(l, i).cast("int")).as("seg"))
    }.reduce(_ unionAll _)

    // probe side: candidate corpus lengths lt±d × segment indexes × start
    // shifts — emit the substring the matching segment would have to be
    val pKeys = pDist
      .withColumn("lt", length(col(probeCol)).cast("long"))
      .withColumn("cl", explode(sequence(col("lt") - maxDist, col("lt") + maxDist)))
      .filter(col("cl") >= parts)
    val pSegs = (0 until parts).map { i =>
      pKeys.select(col("*"), lit(i).as("si"),
        segStart(col("cl"), i).as("ss"), segLen(col("cl"), i).as("sl"))
    }.reduce(_ unionAll _)
      .withColumn("lo", greatest(lit(1L), col("ss") - maxDist))
      .withColumn("hi", least(col("ss") + maxDist, col("lt") - col("sl") + 1L))
      .filter(col("lo") <= col("hi")) // guard: sequence() rejects lo > hi
      .withColumn("p0", explode(sequence(col("lo"), col("hi"))))
      .withColumn("seg", expr(s"substring($probeCol, cast(p0 as int), cast(sl as int))"))
      .drop("lt", "ss", "sl", "lo", "hi", "p0")

    val candidates = pSegs.join(cSegs, Seq("cl", "si", "seg"))
      .drop("cl", "si", "seg")
      .distinct()
      // AQE coalesces the distinct's exchange by BYTES, but the banded-DP
      // levenshtein right above it is CPU-bound per row — a byte-small
      // candidate set otherwise verifies in ONE task (probe-caught at
      // 100×: 30+ min on a single core for ~byte-tiny string pairs). An
      // explicit repartition pins the verify's parallelism; AQE respects
      // user-specified partition counts.
      .repartition(corpus.sparkSession.sessionState.conf.numShufflePartitions)
    val verified = candidates
      .withColumn("dist", levenshtein(col(probeCol), col(corpusCol), maxDist))
      .filter(col("dist") >= 0)
      .unionByName(
        editDistanceJoin(shortCorpus, pDist, corpusCol, probeCol, maxDist))

    // fan the verified distinct-string pairs back out to the input rows
    verified.join(probes, Seq(probeCol)).join(corpus, Seq(corpusCol))
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
      editDistanceJoinSegments(
        Tables.part(s, d).select("p_partkey", "p_name"),
        probeNames(s, d), "p_name", "probe", GateMaxDist)
        .select(col("probe_key"), col("probe"), col("p_partkey"), col("p_name"),
          col("dist").cast("long").as("dist"))
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
      |  CAST(levenshtein(probe, p_name) AS BIGINT) AS dist
      |FROM pc JOIN c USING (cell)
      |WHERE levenshtein(probe, p_name) <= $GateMaxDist
      |ORDER BY probe_key, p_partkey""".stripMargin)
}
