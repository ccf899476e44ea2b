package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{SimOracle, Similarity}

/** SemDeDup-style semantic deduplication over an embedding column: cluster
  * the corpus with a trained coarse codebook (distributed Lloyd,
  * [[graft.sim.Similarity.trainCentroids]]), then prune near-identical
  * vectors WITHIN each cluster by exact cosine — the embedding-space
  * analog of MinHash near-dedup (Abbas et al., "SemDeDup", 2023, public
  * technique).
  *
  * Keep rule: a vector is dropped iff some LOWER-id vector in its cluster
  * is ≥ `threshold` cosine-similar (anchor-by-id — deterministic,
  * engine-reproducible, and exactly expressible in SQL as an EXISTS, so
  * the gate hash-checks the whole pipeline: training, assignment, and
  * pruning).
  *
  * Scale shape: training broadcasts only k centroid vectors per round;
  * assignment is a narrow scan; in-cluster pair generation runs through
  * the skew-capped bucket kernel ([[Dedup.cappedBucketPairs]] keyed by
  * cluster id), so a pathologically crowded cluster sub-splits into
  * bounded salt cells instead of landing one quadratic task. Shuffle
  * volume is O(n·d), never O(pairs·d).
  */
object SemanticDedup {

  /** Gate shape: same codebook geometry as `sim_topk_ivf` (k=16, 2 Lloyd
    * rounds — tractable for the unrolled oracle) over the dup-augmented
    * corpus, pruning at the scaled-duplicate threshold.
    */
  val GateK: Int = graft.sim.SimSurface.IvfK
  val GateIters: Int = graft.sim.SimSurface.IvfIters
  val GateThreshold = 0.999

  /** One row per input vector: (vec_id, cid, kept). */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      bucketCap: Int = Dedup.DefaultBucketCap,
      skewSampleRate: Double = Dedup.DefaultSkewSampleRate): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val thr = threshold

    val cents = Similarity.trainCentroids(vecs, idCol, vecCol, k, iters)
    val assigned = Similarity.ivfAssign(
      vecs, cents.select(col("cid").as(idCol), col("cv").as(vecCol)),
      idCol, vecCol) // (id, cid)

    def clusterRows(d: DataFrame): Dataset[(Long, Array[Double], Double, Long)] = d
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        sqrt(Dedup.dotUdf(col(vecCol), col(vecCol))).as("nrm"))
      .join(assigned, Seq("id"))
      .select(col("id"), col("v"), col("nrm"), col("cid"))
      .as[(Long, Array[Double], Double, Long)]

    val rows = clusterRows(vecs)
    val sampled =
      if (skewSampleRate >= 1.0) rows
      else clusterRows(vecs.sample(withReplacement = false, skewSampleRate, seed = 421L))

    val pairs = Dedup.cappedBucketPairs[
        (Long, Array[Double], Double, Long), Long, (Long, Long)](
      rows, sampled, skewSampleRate, t => t._4, t => t._1, bucketCap) { (a, b) =>
      val va = a._2
      val vb = b._2
      var acc = 0.0
      var t = 0
      val n = math.min(va.length, vb.length)
      while (t < n) { acc = acc + va(t) * vb(t); t += 1 }
      if (acc / (a._3 * b._3) >= thr) Some((a._1, b._1)) else None
    }.toDF("keep_id", "drop_id")

    val dropped = pairs.select(col("drop_id").as("id")).distinct()
      .withColumn("hit", lit(true))
    // materialize eagerly so the trained-codebook checkpoint blocks can be
    // released here (the nearDupSurvivors lifetime contract: a lazy return
    // over `cents` would leak one codebook per invocation in a long-lived
    // app)
    val out = assigned.join(dropped, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cid"),
        coalesce(!col("hit"), lit(true)).as("kept"))
      .transform(graft.plans.Lineage.cut)
    cents.unpersist()
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> ((s, d) =>
      semanticDedup(DedupSurface.vecs(s, d), "vec_id", "v",
        GateK, GateIters, GateThreshold)
        .orderBy("vec_id")))

  private def cosSql(a: String, b: String): String = SimOracle.cosSql(a, b)

  /** Unrolled mirror: re-train the codebook from the dup-augmented corpus
    * (the `v` CTE feeds [[graft.sim.SimSurface.lloydCtes]]), re-derive the
    * assignment, and prune by EXISTS over in-cluster cosine pairs.
    */
  val oracles: Map[String, String] = Map(
    "dedup_semantic" -> s"""WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + ${DedupSurface.vecBandSql},
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001)
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |${graft.sim.SimSurface.lloydCtes(GateK, GateIters)},
      |cent AS (SELECT cid, cv FROM cent$GateIters),
      |assigned AS (
      |  SELECT id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent)
      |  WHERE crank = 1),
      |av AS (SELECT a.id, a.cid, v.v FROM assigned a JOIN v ON v.vec_id = a.id),
      |dropped AS (
      |  SELECT DISTINCT b.id FROM av a JOIN av b
      |    ON a.cid = b.cid AND a.id < b.id
      |  WHERE ${cosSql("a.v", "b.v")} >= $GateThreshold)
      |SELECT av.id AS vec_id, av.cid, (dropped.id IS NULL) AS kept
      |FROM av LEFT JOIN dropped ON dropped.id = av.id
      |ORDER BY vec_id""".stripMargin)
}
