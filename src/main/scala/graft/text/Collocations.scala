package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Collocation extraction: adjacent word pairs that co-occur far more
  * often than their unigram frequencies predict — the association-score
  * layer (lift, the exp of PMI) on top of raw bigram counts, the classic
  * phrase-discovery step between token counting and vocabulary building.
  *
  * Arithmetic contract: all counts are exact longs; `lift` is computed in
  * ONE fixed-order double expression `(c_ab * N * N) / (M * c_a * c_b)`
  * (every step correctly rounded, identical in any engine), and the
  * ranking orders by the INTEGER pair count (ties broken lexically), so
  * no double ever decides row order. That is what lets the gate
  * hash-check lift values exactly.
  *
  * Scale shape: one explode for bigrams, one for unigrams; bigram→unigram
  * count attachment is two equi-joins keyed on the token (shuffle joins —
  * a billion-term vocabulary can't broadcast); the corpus-wide totals
  * attach via a broadcast of two single-row aggregates. Top-k is
  * TakeOrderedAndProject.
  */
object Collocations {

  val GateMinCount = 5
  val GateK = 50

  private def tokenArrays(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(split(col("ntext"), " ").as("t"))

  private def bigrams(t: Column): Column =
    arrays_zip(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))))

  /** Top-k adjacent-pair collocations: (rank, a, b, c_ab, c_a, c_b, lift).
    * Pairs below `minCount` occurrences are noise and dropped before
    * ranking; rank orders by (c_ab desc, a, b).
    */
  def topCollocations(docs: DataFrame, textCol: String,
      minCount: Int = GateMinCount, k: Int = GateK): DataFrame = {
    val toks = tokenArrays(docs, textCol)
    val uni = toks
      .select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val bi = toks
      .select(explode(bigrams(col("t"))).as("p"))
      .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val totals = toks.agg(
      sum(size(col("t"))).cast("long").as("n_tokens"),
      sum(greatest(size(col("t")) - 1, lit(0))).cast("long").as("n_bigrams"))

    val scored = bi
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        col("c_ab").cast("double") * col("n_tokens") * col("n_tokens") /
          (col("n_bigrams").cast("double") * col("c_a") * col("c_b")))

    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("c_ab").desc, col("a"), col("b")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c_ab").desc, col("a"), col("b"))))
      .select(col("rank").cast("long").as("rank"), col("a"), col("b"),
        col("c_ab"), col("c_a"), col("c_b"), col("lift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_collocations" -> ((s, d) =>
      topCollocations(Tables.documents(s, d), "text")
        .orderBy("rank")))

  val oracles: Map[String, String] = Map(
    "txt_collocations" -> s"""
      |WITH norm AS (SELECT
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |tok AS (SELECT string_split(ntext, ' ') AS t
      |        FROM norm WHERE ntext <> ''),
      |uni AS (SELECT tokn AS tok, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM (SELECT unnest(t) AS tokn FROM tok) GROUP BY tokn),
      |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
      |       FROM (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
      |             FROM tok)
      |       GROUP BY a, b HAVING COUNT(*) >= $GateMinCount),
      |tot AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
      |               CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bigrams
      |        FROM tok),
      |scored AS (
      |  SELECT bi.a, bi.b, bi.c_ab, ua.c AS c_a, ub.c AS c_b,
      |    CAST(bi.c_ab AS DOUBLE) * tot.n_tokens * tot.n_tokens /
      |      (CAST(tot.n_bigrams AS DOUBLE) * ua.c * ub.c) AS lift
      |  FROM bi JOIN uni ua ON ua.tok = bi.a
      |          JOIN uni ub ON ub.tok = bi.b, tot)
      |SELECT rank, a, b, c_ab, c_a, c_b, lift FROM (
      |  SELECT *, row_number() OVER (ORDER BY c_ab DESC, a, b) AS rank
      |  FROM scored)
      |WHERE rank <= $GateK ORDER BY rank""".stripMargin)
}
