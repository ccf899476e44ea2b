package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical quality scoring by corpus-trained bigram language model —
  * the CCNet-style filter: train bigram statistics ON the corpus itself,
  * score each document by its mean bigram log-probability, and cut the
  * tails (gibberish scores far low; machine-generated boilerplate
  * suspiciously high). A step up from the surface heuristics in
  * [[TextAnalysis]]: this scorer reads fluency from corpus statistics, not
  * punctuation ratios.
  *
  * Model: Laplace-smoothed conditional `P(w2|w1) = (c12 + 1)/(c1 + V)`
  * where `c12` is the corpus bigram count, `c1` the count of bigrams
  * starting with `w1` (history count), and `V` the distinct-token vocab
  * size. Doc score = mean over the doc's bigrams of `ln P`.
  *
  * Scale shape: ONE shuffle of the bigram stream builds `c12`
  * (partial-agg'd); `c1` re-aggregates the c12 TABLE (vocab-sized, never
  * the stream); `V` and row totals are one-row broadcasts; scoring joins
  * the doc bigram stream back on (w1,w2)/(w1) — co-partitioned with the
  * count tables, AQE picks broadcast when vocab is small. Per-bigram
  * contributions floor to a 1e-6 grid before the per-doc BIGINT sum (the
  * [[Search.Bm25Grid]] rationale: ln is the one non-portable primitive),
  * so scores are hash-exact on any engine.
  */
object LanguageModel {

  val Grid = 1000000.0

  /** (doc_id, w1, w2) bigram stream over normalized whitespace tokens;
    * docs with fewer than 2 tokens carry no bigrams and are excluded.
    */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), split(col("ntext"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-document LM score: (doc_id, n_bigrams, lm_sum_q, lm_avg_q) with
    * `lm_sum_q` the BIGINT sum of grid-floored `ln P(w2|w1)` and
    * `lm_avg_q = floor(lm_sum_q / n_bigrams)` (floor-division via double
    * so both engines round toward -inf on the negative sums).
    *
    * `q` is a pure function of `(c12, c1, V)`, so it is computed once per
    * DISTINCT bigram on the count TABLE (c12 ⋈ c1 — vocab-sized, the c1
    * join reuses c12's partitioning) rather than per occurrence on the
    * stream: the corpus-sized bigram stream then pays exactly one join
    * (against the q table, whose exchange Spark reuses from the c12 build)
    * and one doc aggregate. Same arithmetic per bigram, hash-equal scores.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val qTable = qPerBigram(bg, vocabSize(docs, textCol))
    bg.join(qTable, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("lm_sum_q"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_sum_q"),
        floor(col("lm_sum_q").cast("double") / col("n_bigrams").cast("double"))
          .cast("long").as("lm_avg_q"))
  }

  /** One-row distinct-token vocab size of `docs`. */
  private[text] def vocabSize(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(explode(split(col("ntext"), " ")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))

  /** (w1, w2, q): grid-floored `ln P(w2|w1)` per DISTINCT bigram of the
    * `bg` stream, under the model trained on that same stream.
    */
  private[text] def qPerBigram(bg: DataFrame, vocab: DataFrame): DataFrame = {
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    c12.join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), floor(log(
        (col("c12").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v").cast("double"))) * lit(Grid))
        .cast("long").as("q"))
  }

  /** CCNet-style perplexity bucketing: label every scored document
    * `head` / `middle` / `tail` by which LM-score tercile it falls in
    * WITHIN its language (the public CCNet recipe buckets each language
    * by Wikipedia-LM perplexity terciles and trains preferentially on the
    * head). Cutoffs are EXACT rank-arithmetic quantiles — the score at
    * rank ceil(n/3) and ceil(2n/3) of the best-first order (id
    * tie-break) — so the labeling is value-deterministic on any engine;
    * score ties at a cutoff all take the better bucket.
    *
    * Scale shape: the ranked pass runs over the SCORED table (one row per
    * doc, one shuffle on lang — same shape as the exact-quantile gate);
    * the cutoff table is two values per language, broadcast back onto a
    * narrow labeling join. The scored table feeds BOTH the cutoff pass and
    * the labeling join, so it is materialized once via
    * [[graft.plans.Lineage.cut]] — without the cut, the whole LM scoring
    * pipeline (bigram explode + model joins) re-executes for each consumer.
    * The corpus text itself is never re-shuffled.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, langCol: String,
      textCol: String): DataFrame = {
    val scored = graft.plans.Lineage.cut(score(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("lm_avg_q")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("lm_avg_q").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val cutoffs = scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("lang"))
      .agg(
        max(when(col("rn") === ceil(col("n") / lit(3.0)), col("lm_avg_q")))
          .as("c_head"),
        max(when(col("rn") === ceil(col("n") * lit(2.0) / lit(3.0)),
          col("lm_avg_q"))).as("c_mid"))
    scored.join(broadcast(cutoffs), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lm_avg_q"),
        when(col("lm_avg_q") >= col("c_head"), lit("head"))
          .when(col("lm_avg_q") >= col("c_mid"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_lm_score" -> ((s, d) =>
      score(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),
    "txt_ccnet_buckets" -> ((s, d) =>
      ccnetBuckets(Tables.documents(s, d), "doc_id", "lang", "text")
        .orderBy("doc_id")))

  /** Shared CTE chain re-deriving the trained model + per-doc sums in SQL. */
  private val lmCtes: String = """
      |WITH norm AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |tk AS (SELECT doc_id, string_split(ntext, ' ') AS t
      |       FROM norm WHERE ntext <> ''),
      |bg AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |             FROM tk WHERE len(t) >= 2)),
      |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |        FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
      |vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      |       FROM (SELECT unnest(t) AS tok FROM tk)),
      |sc AS (SELECT b.doc_id, CAST(FLOOR(ln(
      |      (CAST(c12.c12 AS DOUBLE) + 1.0) /
      |        (CAST(c1.c1 AS DOUBLE) + CAST(vv.v AS DOUBLE)))
      |    * 1000000.0) AS BIGINT) AS q
      |  FROM bg b
      |  JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
      |  JOIN c1 ON c1.w1 = b.w1
      |  CROSS JOIN vv),
      |o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |        CAST(SUM(q) AS BIGINT) AS lm_sum_q
      |      FROM sc GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "txt_lm_score" -> (lmCtes + """
      |SELECT doc_id, n_bigrams, lm_sum_q,
      |  CAST(FLOOR(CAST(lm_sum_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) AS BIGINT)
      |    AS lm_avg_q
      |FROM o ORDER BY doc_id""".stripMargin),
    "txt_ccnet_buckets" -> (lmCtes + """
      |, l AS (SELECT o.doc_id, d.lang,
      |    CAST(FLOOR(CAST(lm_sum_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) AS BIGINT)
      |      AS lm_avg_q
      |  FROM o JOIN documents d USING (doc_id)),
      |r AS (SELECT doc_id, lang, lm_avg_q,
      |    CAST(row_number() OVER (PARTITION BY lang
      |                            ORDER BY lm_avg_q DESC, doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      |  FROM l),
      |c AS (SELECT lang,
      |    MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS BIGINT)
      |        THEN lm_avg_q END) AS c_head,
      |    MAX(CASE WHEN rn = CAST(CEIL(n * 2.0 / 3.0) AS BIGINT)
      |        THEN lm_avg_q END) AS c_mid
      |  FROM r GROUP BY lang)
      |SELECT l.doc_id, l.lang, l.lm_avg_q,
      |  CASE WHEN l.lm_avg_q >= c.c_head THEN 'head'
      |       WHEN l.lm_avg_q >= c.c_mid THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM l JOIN c USING (lang)
      |ORDER BY doc_id""".stripMargin))
}
