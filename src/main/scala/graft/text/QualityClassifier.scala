package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Model-based quality filtering: a logistic-regression classifier TRAINED
  * IN THE ENGINE by distributed batch gradient descent — the
  * fasttext-classifier stage of public pretraining pipelines (GPT-3 /
  * LLaMA-style quality filters), reduced to its Spark-native skeleton:
  * features and gradients are whole-corpus aggregations, weights are a
  * driver-held vector (like [[graft.sim.Similarity.trainCentroids]]'s
  * codebook: only model-sized state crosses the driver boundary).
  *
  * Determinism contract (the trained-artifact gate pattern the IVF/BPE
  * gates established): every feature is a BIGINT on a 1e-6 grid, the GD
  * round's only transcendental (`sigmoid`) is floored onto the same grid
  * immediately, and gradient sums are BIGINT — so training is bit-exact
  * across partitionings AND engines, and the DuckDB oracle re-trains the
  * identical model by unrolling the rounds as CTEs.
  *
  * Scale shape: features = one narrow scan; each GD round = ONE
  * partial-agg'd pass over the cached feature table emitting 4 gradient
  * sums (one row to the driver); scoring = one narrow projection with the
  * weights in the closure. Rounds are sequential by nature; everything
  * inside a round is embarrassingly parallel.
  */
object QualityClassifier {

  val Grid = 1000000L
  val Rounds = 4
  val Lr = 0.5

  private val featCols = Seq("f0", "f1", "f2", "f3")

  /** Feature table: (doc_id, y, f0..f3), all BIGINT at 1e-6 scale.
    *  f0 bias; f1 capped token count; f2 English-stopword density (the
    *  label signal); f3 capped mean token length. `y` = 1 iff `labelCol`
    *  equals `posLabel`.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, posLabel: String): DataFrame = {
    val ntext = TextAnalysis.normalized(col(textCol))
    val padded = concat(lit(" "), col("ntext"), lit(" "))
    docs
      .select(col(idCol).as("doc_id"),
        (col(labelCol) === posLabel).cast("long").as("y"), ntext.as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), col("y"),
        size(split(col("ntext"), " ")).cast("long").as("n"),
        length(regexp_replace(col("ntext"), " ", "")).cast("long").as("chars"),
        TextAnalysis.langScore(padded, "en").as("stop_hits"))
      .select(col("doc_id"), col("y"),
        lit(Grid).as("f0"),
        (least(col("n"), lit(100L)) * lit(10000L)).as("f1"),
        floor(col("stop_hits").cast("double") * lit(Grid.toDouble) /
          col("n").cast("double")).cast("long").as("f2"),
        least(floor(col("chars").cast("double") * lit(Grid.toDouble) /
          (lit(20.0) * col("n").cast("double"))).cast("long"), lit(Grid)).as("f3"))
  }

  /** Grid-floored sigmoid of the 1e-12-scale dot product `zQ12`. */
  private def sigmoidQ(zQ12: Column): Column =
    floor(lit(1.0) / (lit(1.0) +
      exp(-(zQ12.cast("double") / lit(1e12)))) * lit(Grid.toDouble)).cast("long")

  private def dotQ12(w: Array[Long]): Column =
    featCols.zip(w).map { case (c, wj) => col(c) * lit(wj) }
      .reduce(_ + _)

  /** Batch-GD training: `Rounds` passes, each one aggregation emitting the
    * 4 gradient sums. Returns the final 1e-6-scale weight vector.
    */
  def train(feats: DataFrame): Array[Long] = {
    val cached = feats.cache()
    try {
      val n = cached.count().toDouble
      val w = Array.fill(featCols.length)(0L)
      for (_ <- 1 to Rounds) {
        val err = (sigmoidQ(dotQ12(w)) - col("y") * lit(Grid)).as("err")
        val grads = cached.select((err +: featCols.map(col)): _*)
          .agg(sum(col("err") * col("f0")),
            sum(col("err") * col("f1")),
            sum(col("err") * col("f2")),
            sum(col("err") * col("f3"))).head()
        for (j <- featCols.indices)
          w(j) -= math.floor(Lr * grads.getLong(j) / (n * Grid)).toLong
      }
      w
    } finally { cached.unpersist(); () }
  }

  /** Per-doc quality score under weights `w`: (doc_id, y, score_q) with
    * `score_q` the grid-floored P(quality) in [0, 1e6].
    */
  def scoreWith(feats: DataFrame, w: Array[Long]): DataFrame =
    feats.select(col("doc_id"), col("y"), sigmoidQ(dotQ12(w)).as("score_q"))

  /** Train on the corpus and score every document — the full filter stage. */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, posLabel: String): DataFrame = {
    val feats = features(docs, idCol, textCol, labelCol, posLabel)
    scoreWith(feats, train(feats))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_lr_quality" -> ((s, d) =>
      trainAndScore(Tables.documents(s, d), "doc_id", "text", "lang", "en")
        .orderBy("doc_id")))

  // ---- DuckDB oracle: the identical model, rounds unrolled as CTEs ----

  private def gradCte(r: Int): String =
    s"""g$r AS (SELECT
       |  SUM(err * f0) AS g0, SUM(err * f1) AS g1,
       |  SUM(err * f2) AS g2, SUM(err * f3) AS g3
       |  FROM (SELECT f.f0, f.f1, f.f2, f.f3,
       |    CAST(FLOOR(1.0 / (1.0 + exp(-(CAST(f.f0*w.w0 + f.f1*w.w1 +
       |        f.f2*w.w2 + f.f3*w.w3 AS DOUBLE) / 1e12))) * 1000000.0)
       |      AS BIGINT) - f.y * 1000000 AS err
       |    FROM f, w${r - 1} w)),
       |w$r AS (SELECT
       |  w.w0 - CAST(FLOOR(0.5 * CAST(g.g0 AS DOUBLE) / (n.n * 1000000.0)) AS BIGINT) AS w0,
       |  w.w1 - CAST(FLOOR(0.5 * CAST(g.g1 AS DOUBLE) / (n.n * 1000000.0)) AS BIGINT) AS w1,
       |  w.w2 - CAST(FLOOR(0.5 * CAST(g.g2 AS DOUBLE) / (n.n * 1000000.0)) AS BIGINT) AS w2,
       |  w.w3 - CAST(FLOOR(0.5 * CAST(g.g3 AS DOUBLE) / (n.n * 1000000.0)) AS BIGINT) AS w3
       |  FROM w${r - 1} w, g$r g, n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "txt_lr_quality" -> (s"""
      |WITH norm AS (SELECT doc_id, lang,
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |base AS (SELECT doc_id,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
      |    CAST(len(string_split(ntext, ' ')) AS BIGINT) AS n,
      |    CAST(length(replace(ntext, ' ', '')) AS BIGINT) AS chars,
      |    ' ' || ntext || ' ' AS pad
      |  FROM norm WHERE ntext <> ''),
      |f AS (SELECT doc_id, y,
      |    CAST(1000000 AS BIGINT) AS f0,
      |    LEAST(n, 100) * 10000 AS f1,
      |    CAST(FLOOR(CAST(
      |        (length(pad) - length(replace(pad, ' the ', ''))) / 5
      |      + (length(pad) - length(replace(pad, ' and ', ''))) / 5
      |      + (length(pad) - length(replace(pad, ' is ', ''))) / 4
      |      AS DOUBLE) * 1000000.0 / CAST(n AS DOUBLE)) AS BIGINT) AS f2,
      |    LEAST(CAST(FLOOR(CAST(chars AS DOUBLE) * 1000000.0 /
      |      (20.0 * CAST(n AS DOUBLE))) AS BIGINT), 1000000) AS f3
      |  FROM base),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),
      |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
      |       CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
      |${(1 to Rounds).map(gradCte).mkString(",\n")}
      |SELECT f.doc_id, f.y,
      |  CAST(FLOOR(1.0 / (1.0 + exp(-(CAST(f.f0*w.w0 + f.f1*w.w1 +
      |      f.f2*w.w2 + f.f3*w.w3 AS DOUBLE) / 1e12))) * 1000000.0)
      |    AS BIGINT) AS score_q
      |FROM f, w$Rounds w ORDER BY f.doc_id""").stripMargin)
}
