package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE-style merge training over the corpus — the tokenizer-
  * vocabulary step of an LLM data pipeline (Sennrich et al. 2016, public
  * technique), at the word level: symbols start as whitespace tokens of
  * the normalized text, and training repeatedly merges the most frequent
  * ADJACENT symbol pairs.
  *
  * Merges are learned in BATCHES (the public "fast BPE" batching): each
  * round takes the top-[[GateBatch]] pairs by (freq DESC, left, right) and
  * keeps every pair that shares no symbol with a higher-ranked candidate —
  * pairwise-disjoint symbols make the whole batch's occurrences
  * non-overlapping, so the batch applies SIMULTANEOUSLY in one
  * position-independent scan. That decouples merge count from shuffle
  * count: m merges per round cost ONE pair-count shuffle, not m — the
  * difference between 30k shuffles and ~4k for a real 30k-merge vocab.
  *
  * Variant for engine-reproducibility: self-pairs (a == b) are not merge
  * candidates (occurrences of a≠b pairs never overlap), the disjointness
  * rule compares against all higher-RANKED candidates (kept or not — a
  * one-shot rule with no sequential state), and ties break
  * (freq DESC, left ASC, right ASC). Every step is a pure per-row map or
  * a rank filter, so the DuckDB oracle re-trains the identical merge
  * table as unrolled SQL rounds and hash-checks it.
  *
  * Scale shape per round: one explode of adjacent pairs + a partial-agg
  * count (the only shuffle), a driver-side argtop of ≤ [[GateBatch]] rows
  * (the merge table is the model, exactly the codebook pattern of
  * `trainCentroids`), then a narrow map applies the batch. Driver state is
  * O(total merges). [[graft.plans.Lineage.cut]] truncates the per-round
  * lineage.
  */
object Bpe {

  /** Gate rounds × candidate window: 3 rounds of up-to-8-candidate batches
    * learn more merges than the old 6 single-merge rounds in half the
    * shuffles.
    */
  val GateRounds = 3
  val GateBatch = 8

  /** Adjacent symbol pairs of an array column, as (a, b) structs. */
  private def adjacentPairs(t: Column): Column =
    arrays_zip(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))))

  /** Apply a BATCH of (a, b) -> "a b" merges to a symbol array in one scan.
    * Safe to evaluate position-independently: batch pairs have pairwise
    * disjoint symbols and no self-pairs, so no two merge sites can overlap
    * and a position matches at most one pair.
    */
  private[text] val applyMergesUdf =
    udf { (t: Seq[String], as: Seq[String], bs: Seq[String]) =>
      if (t == null) null
      else {
        val pairs = as.zip(bs).toSet
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && pairs.contains((t(i), t(i + 1)))) {
            out += s"${t(i)} ${t(i + 1)}"
            i += 2
          } else {
            out += t(i)
            i += 1
          }
        }
        out.toSeq
      }
    }

  /** The batch rule, driver-side: from the top-`batch` candidates in
    * (freq DESC, a, b) order, keep each pair sharing no symbol with ANY
    * higher-ranked candidate (kept or not). One-shot and deterministic —
    * the SQL mirror is a rank self-join, not a sequential fold.
    */
  private[text] def selectBatch(
      top: Seq[(String, String, Long)]): Seq[(String, String, Long)] =
    top.zipWithIndex.collect {
      case ((a, b, c), i) if top.take(i).forall { case (ua, ub, _) =>
        ua != a && ua != b && ub != a && ub != b } => (a, b, c)
    }

  /** Train up to `rounds` merge batches; returns (round, left, right, freq)
    * — the merge table. Within a round, rows are the batch's kept pairs;
    * application order within a batch is immaterial (disjoint symbols).
    * Stops early if no eligible pair remains.
    *
    * Training runs on the DISTINCT token-array table with multiplicities
    * (the word-frequency form of classic BPE, and the engine's standard
    * exact-dup-collapse move): identical docs collapse into one weighted
    * row before any per-round work, so an exact-duplicate-heavy corpus —
    * the normal shape of a 100 TB crawl — pays per distinct doc, not per
    * copy. Pair frequencies are identical by construction
    * (Σ weights ≡ raw occurrence count).
    */
  /** Rounds between lineage cuts while training: a batch-apply is one
    * narrow UDF map, so stacking a few per plan is free, while each eager
    * cut is a whole extra materialization job over the weighted token
    * table — at the gate's 3 rounds the training runs with ZERO
    * intermediate cuts (one collect job per round, nothing else), and a
    * 30k-merge production run still bounds its plan depth.
    */
  val CutEvery = 4

  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
      batch: Int = GateBatch): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // lazy cut: round 1's pair collect is the materializing action, so
    // the weighted token table costs zero extra jobs to pin. (A
    // repartition-to-cores here measured 1.1 s → 2.0 s at sf0.1: the
    // extra exchange and 32-task waves cost more than the near-serial
    // round stages they replaced — AQE's coalescing is the right call.)
    var lastCut = docs
      .select(TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(split(col("ntext"), " ").as("t"))
      .groupBy("t").agg(count(lit(1)).as("w"))
      .transform(graft.plans.Lineage.cutLazy)
    var toks = lastCut
    // round emits as BIGINT: int32 is a driver-risk output type (see
    // tools/check_oracle.py)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var sinceCut = 0
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = toks
        .select(col("w"), explode(adjacentPairs(col("t"))).as("p"))
        .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"),
          col("w"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(sum("w").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(batch)
        .as[(String, String, Long)]
        .collect()
        .toSeq
      if (top.isEmpty) exhausted = true
      else {
        val sel = selectBatch(top)
        sel.foreach { case (a, b, c) => merges += ((round.toLong, a, b, c)) }
        // the final round's merges are already collected — building (and
        // materializing) its post-apply table would be pure waste
        if (round < rounds) {
          toks = toks.select(applyMergesUdf(col("t"),
            typedLit(sel.map(_._1)), typedLit(sel.map(_._2))).as("t"), col("w"))
          sinceCut += 1
          if (sinceCut >= CutEvery) {
            val cut = toks.transform(graft.plans.Lineage.cut)
            lastCut.unpersist()
            lastCut = cut
            toks = cut
            sinceCut = 0
          }
        }
        round += 1
      }
    }
    lastCut.unpersist()
    merges.result().toDF("round", "left", "right", "freq")
      .select(col("round"), col("left"), col("right"), col("freq"))
  }

  /** Tokenize a corpus with a trained merge table: apply the merge BATCHES
    * in round order, each batch in one simultaneous scan (sequential
    * application of a batch is NOT equivalent — an earlier merge's output
    * symbol can textually equal a later pair's operand; training applies
    * batches simultaneously and so must tokenization). The batch list
    * rides the closure — model-sized, like a broadcast codebook. Returns
    * one row per doc with the post-merge symbols and their count.
    */
  def tokenizeWithMerges(docs: DataFrame, idCol: String, textCol: String,
      batches: Seq[Seq[(String, String)]]): DataFrame = {
    // scale-adaptive widening: a small corpus arrives as ONE scan
    // partition, serializing the whole merge-apply + fingerprint chain on
    // a single core; never repartition an already-parallel scan (at
    // corpus scale that would be a full text shuffle)
    val raw = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val wide = graft.plans.Parallelism.widen(raw)
    val base = wide
      .select(col("doc_id"),
        TextAnalysis.normalized(col("__text")).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), split(col("ntext"), " ").as("t"))
    batches.foldLeft(base) { case (df, batch) =>
      df.withColumn("t", applyMergesUdf(col("t"),
        typedLit(batch.map(_._1)), typedLit(batch.map(_._2))))
    }.select(col("doc_id"), col("t").as("symbols"),
      size(col("t")).cast("long").as("n_symbols"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_bpe_merges" -> ((s, d) =>
      trainMerges(Tables.documents(s, d), "text", GateRounds)
        .orderBy(col("round"), col("freq").desc, col("left"), col("right"))),
    "pipe_bpe_tokens" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val batches = trainMerges(Tables.documents(s, d), "text", GateRounds)
        .orderBy(col("round"), col("freq").desc, col("left"), col("right"))
        .select("round", "left", "right").as[(Long, String, String)].collect()
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(r => (r._2, r._3)).toSeq)
      tokenizeWithMerges(Tables.documents(s, d), "doc_id", "text", batches)
        // fingerprint the symbol list (US-separator join) — scalar columns
        // hash portably through the driver compare
        .select(col("doc_id"), col("n_symbols"),
          md5(concat_ws("", col("symbols"))).as("sym_md5"))
        .orderBy("doc_id")
    }))

  /** Unrolled-round mirror: each round re-counts adjacent pairs, takes the
    * top-[[GateBatch]] by (freq DESC, a, b), keeps candidates disjoint from
    * every higher-ranked one (the same one-shot rule as [[selectBatch]]),
    * and applies the batch with the position-independent CASE map keyed on
    * a chr(30)-composite pair list. When a round selects nothing, `ms` is
    * NULL (aggregate over zero rows) and `list_contains(NULL, …)` is
    * falsy, so tok$r passes through unchanged — mirroring Spark's early
    * stop instead of emptying the token stream.
    */
  private def bpeRounds(rounds: Int, batch: Int): String =
    (1 to rounds).map { r =>
      s"""p$r AS (SELECT a, b, CAST(SUM(w) AS BIGINT) AS c
         |  FROM (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b, w
         |        FROM wtok${r - 1})
         |  WHERE a <> b GROUP BY a, b),
         |cand$r AS (SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
         |  FROM p$r ORDER BY c DESC, a, b LIMIT $batch),
         |sel$r AS (SELECT a, b, c, rk FROM cand$r tt WHERE NOT EXISTS (
         |    SELECT 1 FROM cand$r u WHERE u.rk < tt.rk
         |      AND (u.a = tt.a OR u.a = tt.b OR u.b = tt.a OR u.b = tt.b))),
         |ms$r AS (SELECT list(a || chr(30) || b) AS ms FROM sel$r),
         |wtok$r AS (SELECT
         |  list_filter(
         |    list_transform(range(1, len(t) + 1), i ->
         |      CASE WHEN i < len(t) AND list_contains(ms, t[i] || chr(30) || t[i + 1])
         |             THEN t[i] || ' ' || t[i + 1]
         |           WHEN i > 1 AND list_contains(ms, t[i - 1] || chr(30) || t[i]) THEN NULL
         |           ELSE t[i] END),
         |    x -> x IS NOT NULL) AS t, w
         |  FROM wtok${r - 1}, ms$r),
         |tok$r AS (SELECT doc_id,
         |  list_filter(
         |    list_transform(range(1, len(t) + 1), i ->
         |      CASE WHEN i < len(t) AND list_contains(ms, t[i] || chr(30) || t[i + 1])
         |             THEN t[i] || ' ' || t[i + 1]
         |           WHEN i > 1 AND list_contains(ms, t[i - 1] || chr(30) || t[i]) THEN NULL
         |           ELSE t[i] END),
         |    x -> x IS NOT NULL) AS t
         |  FROM tok${r - 1}, ms$r)""".stripMargin
    }.mkString(",\n")

  private val tokCtes = s"""norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |tok0 AS (SELECT doc_id, string_split(ntext, ' ') AS t
      |         FROM norm WHERE ntext <> ''),
      |wtok0 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS w FROM tok0 GROUP BY t),
      |${bpeRounds(GateRounds, GateBatch)}""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_bpe_merges" -> s"""
      |WITH $tokCtes
      |${(1 to GateRounds).map(r =>
           s"SELECT CAST($r AS BIGINT) AS round, a AS \"left\", b AS \"right\", c AS freq FROM sel$r")
          .mkString("", "\nUNION ALL\n", "")}
      |ORDER BY round, freq DESC, "left", "right"""".stripMargin,
    "pipe_bpe_tokens" -> s"""
      |WITH $tokCtes
      |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_symbols,
      |  md5(array_to_string(t, chr(31))) AS sym_md5
      |FROM tok$GateRounds ORDER BY doc_id""".stripMargin)
}
