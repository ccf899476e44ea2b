package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE-style merge training over the corpus — the tokenizer-
  * vocabulary step of an LLM data pipeline (Sennrich et al. 2016, public
  * technique), at the word level: symbols start as whitespace tokens of
  * the normalized text and each round merges the globally most frequent
  * ADJACENT symbol pair into one symbol.
  *
  * Variant for engine-reproducibility: self-pairs (a == b) are not merge
  * candidates. For a != b, occurrences of (a, b) can never overlap, so
  * "replace all occurrences" is position-independent and parallel — the
  * merge application is a pure per-row map, identical in any engine, and
  * the whole training run is expressible as unrolled SQL rounds (the
  * DuckDB oracle re-trains the merge table and hash-checks it). Ties
  * break (freq DESC, left ASC, right ASC).
  *
  * Scale shape per round: one explode of adjacent pairs + a partial-agg
  * count (the only shuffle), a driver-side argmax of ONE row (exactly the
  * codebook pattern of `trainCentroids` — the merge table is the model),
  * then a narrow map applies the merge. State on the driver is O(rounds).
  * `localCheckpoint` truncates the growing per-round lineage.
  */
object Bpe {

  val GateRounds = 6

  /** Adjacent symbol pairs of an array column, as (a, b) structs. */
  private def adjacentPairs(t: Column): Column =
    arrays_zip(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))))

  /** Apply one (a, b) -> "a b" merge to a symbol array. Safe to evaluate
    * position-independently because a != b (no overlapping occurrences).
    */
  private[text] val applyMergeUdf =
    udf { (t: Seq[String], a: String, b: String) =>
      if (t == null) null
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
            out += s"$a $b"
            i += 2
          } else {
            out += t(i)
            i += 1
          }
        }
        out.toSeq
      }
    }

  /** Train `rounds` merges; returns (round, left, right, freq) — the merge
    * table, in training order. Stops early if no eligible pair remains.
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var toks = docs
      .select(TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(split(col("ntext"), " ").as("t"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = toks
        .select(explode(adjacentPairs(col("t"))).as("p"))
        .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((a, b, c)) =>
          merges += ((round, a, b, c))
          val next = toks
            .select(applyMergeUdf(col("t"), lit(a), lit(b)).as("t"))
            .localCheckpoint(true)
          toks.unpersist()
          toks = next
          round += 1
      }
    }
    toks.unpersist()
    merges.result().toDF("round", "left", "right", "freq")
      .select(col("round"), col("left"), col("right"), col("freq"))
  }

  /** Tokenize a corpus with a trained merge table: apply the merges in
    * training order (each application is the narrow position-independent
    * map; the merge list rides the closure — it's model-sized, like a
    * broadcast codebook). Returns one row per doc with the post-merge
    * symbols and their count.
    */
  def tokenizeWithMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), split(col("ntext"), " ").as("t"))
    merges.foldLeft(base) { case (df, (a, b)) =>
      df.withColumn("t", applyMergeUdf(col("t"), lit(a), lit(b)))
    }.select(col("doc_id"), col("t").as("symbols"),
      size(col("t")).cast("long").as("n_symbols"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_bpe_merges" -> ((s, d) =>
      trainMerges(Tables.documents(s, d), "text", GateRounds)
        .orderBy("round")),
    "pipe_bpe_tokens" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val merges = trainMerges(Tables.documents(s, d), "text", GateRounds)
        .orderBy("round")
        .select("left", "right").as[(String, String)].collect().toSeq
      tokenizeWithMerges(Tables.documents(s, d), "doc_id", "text", merges)
        // fingerprint the symbol list (US-separator join) — scalar columns
        // hash portably through the driver compare
        .select(col("doc_id"), col("n_symbols"),
          md5(concat_ws("\u001f", col("symbols"))).as("sym_md5"))
        .orderBy("doc_id")
    }))

  /** Unrolled-round mirror: each round re-counts adjacent pairs, picks the
    * (freq DESC, a, b) argmax, and applies the merge with the same
    * position-independent CASE map. `t[i+1]` past the end is NULL in
    * DuckDB list indexing, guarded by `i < len(t)` anyway.
    */
  private def bpeRounds(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""p$r AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
         |        FROM tok${r - 1})
         |  WHERE a <> b GROUP BY a, b),
         |m$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |tok$r AS (SELECT doc_id,
         |  list_filter(
         |    list_transform(range(1, len(t) + 1), i ->
         |      CASE WHEN i < len(t) AND t[i] = m.a AND t[i + 1] = m.b
         |             THEN m.a || ' ' || m.b
         |           WHEN i > 1 AND t[i - 1] = m.a AND t[i] = m.b THEN NULL
         |           ELSE t[i] END),
         |    x -> x IS NOT NULL) AS t
         |  FROM tok${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")

  private val tokCtes = s"""norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |tok0 AS (SELECT doc_id, string_split(ntext, ' ') AS t
      |         FROM norm WHERE ntext <> ''),
      |${bpeRounds(GateRounds)}""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_bpe_merges" -> s"""
      |WITH $tokCtes
      |${(1 to GateRounds).map(r =>
           s"SELECT $r AS round, a AS \"left\", b AS \"right\", c AS freq FROM m$r")
          .mkString("", "\nUNION ALL\n", "")}
      |ORDER BY round""".stripMargin,
    "pipe_bpe_tokens" -> s"""
      |WITH $tokCtes
      |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_symbols,
      |  md5(array_to_string(t, chr(31))) AS sym_md5
      |FROM tok$GateRounds ORDER BY doc_id""".stripMargin)
}
