package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing bundle for similarity search over `embeddings`. */
object SimSurface {

  val Dims = 64
  val Planes = 8
  val K = 10
  // trained-codebook gate shape: small k and two Lloyd rounds keep the
  // unrolled oracle tractable while exercising the full training path
  val IvfK = 16
  val IvfIters = 2
  // PQ gate shape: 4 subspaces × 16 dims, 8 centroids each, two Lloyd
  // rounds — the oracle re-trains all of it unrolled
  val PqM = 4
  val PqKsub = 8
  val PqIters = 2
  // IVFADC gate shape: 8 coarse lists, probe 2, residual-PQ with the same
  // subspace geometry
  val IvfPqNlist = 8
  val IvfPqNprobe = 2

  private def vecsD(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  private def queriesD(s: SparkSession, d: String): DataFrame =
    vecsD(s, d).filter(col("vec_id") < 10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> ((s, d) =>
      Similarity.bruteForceTopK(queriesD(s, d), vecsD(s, d), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
    "sim_topk_lsh" -> ((s, d) =>
      Similarity.lshTopK(queriesD(s, d), vecsD(s, d), "vec_id", "v", K, Planes, Dims)
        .orderBy("query_id", "rank")),
    // the codebook is TRAINED (distributed Lloyd, quantized order-free
    // means) — the DuckDB oracle re-trains the identical codebook from the
    // same init and hash-checks the probe results on it
    "sim_topk_ivf" -> ((s, d) => {
      val trained = Similarity
        .trainCentroids(vecsD(s, d), "vec_id", "v", IvfK, IvfIters)
        .select(col("cid").as("vec_id"), col("cv").as("v"))
      Similarity.ivfTopK(queriesD(s, d), vecsD(s, d), trained, "vec_id", "v", K)
        .orderBy("query_id", "rank")
    }),
    // bounded-heap partial-aggregate form — result-identical to the window
    // form, so it shares the brute-force oracle
    "sim_topk_heap" -> ((s, d) =>
      Similarity.heapTopK(queriesD(s, d), vecsD(s, d), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
    // int8-quantized ranking: approximate vs float cosine, but exactly
    // deterministic (BIGINT scores) — hash-checked end to end
    "sim_topk_int8" -> ((s, d) =>
      Similarity.int8TopK(queriesD(s, d), vecsD(s, d), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
    // full PQ path: train per-subspace codebooks, encode the corpus to
    // 4-code rows, ADC-rank — the oracle re-trains the identical codebooks
    "sim_topk_pq" -> ((s, d) => {
      val cb = ProductQuantization.trainCodebooks(
        vecsD(s, d), "vec_id", "v", Dims, PqM, PqKsub, PqIters)
      ProductQuantization.topK(queriesD(s, d), vecsD(s, d), cb,
        "vec_id", "v", Dims, PqM, K)
        .orderBy("query_id", "rank")
    }),
    // IVFADC: trained coarse lists + residual-PQ codebooks + probed ADC —
    // the oracle re-trains BOTH codebooks and re-derives the probe sets
    "sim_topk_ivfpq" -> ((s, d) => {
      val vecs = vecsD(s, d)
      val coarse = Similarity.trainCentroids(
        vecs, "vec_id", "v", IvfPqNlist, IvfIters)
      val resid = ProductQuantization.residuals(vecs, coarse, "vec_id", "v")
      val cb = ProductQuantization.trainCodebooks(
        resid, "id", "rv", Dims, PqM, PqKsub, PqIters)
      ProductQuantization.ivfPqTopK(queriesD(s, d), vecs, coarse, cb,
        "vec_id", "v", Dims, PqM, K, IvfPqNprobe)
        .orderBy("query_id", "rank")
    }),
    // the deployment shape: the index (coarse + codebooks + encoded corpus)
    // is TRAINED AND PERSISTED once per dataset, and the gate times only
    // load + probe — what a query actually costs once the corpus is indexed.
    // Results are bit-identical to sim_topk_ivfpq (shared oracle semantics).
    "sim_topk_ivfpq_indexed" -> ((s, d) =>
      AnnIndex.searchIvfPq(queriesD(s, d),
        AnnIndex.load(s, indexDir(s, d)), "vec_id", "v", K, IvfPqNprobe)
        .orderBy("query_id", "rank")),
    // the daily-drop shape: index trained+built on HALF the corpus (even
    // ids), the other half appended through the exactly-once drop path
    // (encoded with the persisted codebooks, never retrained), then
    // searched — the oracle re-derives coarse+PQ from the day-A half and
    // encodes the union, so the gate passes only if append ≡ re-encode
    "sim_topk_ivfpq_appended" -> ((s, d) =>
      AnnIndex.searchIvfPq(queriesD(s, d),
        AnnIndex.load(s, appendedIndexDir(s, d)), "vec_id", "v", K, IvfPqNprobe)
        .orderBy("query_id", "rank")),
    // the flat-PQ deployment twin of sim_topk_ivfpq_indexed: codebooks and
    // code table trained+persisted once per dataset, the gate times only
    // load + ADC probe — results bit-identical to the re-training
    // sim_topk_pq (shared oracle)
    "sim_topk_pq_indexed" -> ((s, d) =>
      AnnIndex.searchPq(queriesD(s, d),
        AnnIndex.loadPq(s, pqIndexDir(s, d)), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
  )

  /** One persisted IVF-PQ index per dataset per JVM (built on first use,
    * atomic-published under java.io.tmpdir) — the gate above times search
    * only, the way a production corpus is queried.
    */
  private val indexDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def indexDir(s: SparkSession, d: String): String =
    indexDirs.getOrElseUpdate(d, {
      val p = java.nio.file.Files.createTempDirectory("graft-ann").toString + "/ivfpq"
      AnnIndex.buildIvfPq(vecsD(s, d), "vec_id", "v", p,
        Dims, PqM, PqKsub, PqIters, IvfPqNlist)
      p
    })

  private val pqDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def pqIndexDir(s: SparkSession, d: String): String =
    pqDirs.getOrElseUpdate(d, {
      val p = java.nio.file.Files.createTempDirectory("graft-ann-pq").toString + "/pq"
      AnnIndex.buildPq(vecsD(s, d), "vec_id", "v", p, Dims, PqM, PqKsub, PqIters)
      p
    })

  private val appendedDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def appendedIndexDir(s: SparkSession, d: String): String =
    appendedDirs.getOrElseUpdate(d, {
      val p = java.nio.file.Files.createTempDirectory("graft-ann-app").toString + "/ivfpq"
      AnnIndex.buildIvfPq(vecsD(s, d).filter(col("vec_id") % 2 === 0),
        "vec_id", "v", p, Dims, PqM, PqKsub, PqIters, IvfPqNlist)
      AnnIndex.appendIvfPq(s, p,
        vecsD(s, d).filter(col("vec_id") % 2 === 1), "vec_id", "v", "day-b")
      p
    })

  // ---- DuckDB mirrors ----

  private val vecsCte =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |     FROM embeddings)""".stripMargin

  private def cosSql(a: String, b: String): String = SimOracle.cosSql(a, b)

  private def bucketSql(v: String): String = SimOracle.bucketSql(v, Planes, Dims)

  /** Unrolled Lloyd mirror of `Similarity.trainCentroids`: init = k
    * lowest-id vectors, each round = cosine assignment (ties to lowest cid)
    * + 1e-6-quantized dimension means (BIGINT sums — order-free, so both
    * engines produce the bit-identical codebook) with empty centroids
    * keeping their previous vector.
    */
  private[graft] def lloydCtes(k: Int, iters: Int, src: String = "v"): String = {
    val init = s"cent0 AS (SELECT vec_id AS cid, v AS cv FROM $src ORDER BY vec_id LIMIT $k)"
    val rounds = (1 to iters).map { i =>
      val prev = s"cent${i - 1}"
      s"""a$i AS (
         |  SELECT id, cid FROM (
         |    SELECT t.vec_id AS id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${cosSql("t.v", "c.cv")} DESC, c.cid) AS crank
         |    FROM $src t CROSS JOIN $prev c)
         |  WHERE crank = 1),
         |m$i AS (
         |  SELECT cid, dim,
         |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / (COUNT(*) * 1000000.0) AS m
         |  FROM (SELECT a$i.cid, generate_subscripts(t.v, 1) AS dim, unnest(t.v) AS x
         |        FROM a$i JOIN $src t ON t.vec_id = a$i.id)
         |  GROUP BY cid, dim),
         |mc$i AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m$i GROUP BY cid),
         |cent$i AS (SELECT p.cid, COALESCE(mc$i.cv, p.cv) AS cv
         |           FROM $prev p LEFT JOIN mc$i USING (cid))""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** Unrolled PQ-codebook training mirror of
    * `ProductQuantization.trainCodebooks` over source table `src` with
    * vector column `vec`: per-subspace slices, donor init, `iters`
    * L2-Lloyd rounds on the 1e-6 grid, dense code reindex. Emits CTEs
    * `subs`, `sv`, `pc0..pc$iters`, `cb`.
    */
  private[graft] def pqTrainCtes(m: Int, ksub: Int, iters: Int, subDim: Int,
      src: String, vec: String): String = {
    def l2(a: String, b: String) = SimOracle.l2Sql(a, b)
    val base = s"""subs AS (SELECT unnest(range(0, $m)) AS sub),
      |sv AS (SELECT vec_id, sub,
      |         $vec[(sub * $subDim + 1):(sub * $subDim + $subDim)] AS svec
      |       FROM $src CROSS JOIN subs),
      |donors AS (SELECT vec_id FROM $src ORDER BY vec_id LIMIT $ksub),
      |pc0 AS (SELECT s.sub, s.vec_id AS cid, s.svec AS cv
      |        FROM sv s JOIN donors d ON d.vec_id = s.vec_id)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""pa$r AS (SELECT id, sub, cid FROM (
         |    SELECT s.vec_id AS id, s.sub, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY ${l2("s.svec", "c.cv")} ASC, c.cid) AS rk
         |    FROM sv s JOIN pc${r - 1} c ON c.sub = s.sub) WHERE rk = 1),
         |pm$r AS (SELECT sub, cid, dim,
         |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / (COUNT(*) * 1000000.0) AS mv
         |  FROM (SELECT a.sub, a.cid, generate_subscripts(s.svec, 1) AS dim,
         |          unnest(s.svec) AS x
         |        FROM pa$r a JOIN sv s ON s.vec_id = a.id AND s.sub = a.sub)
         |  GROUP BY sub, cid, dim),
         |pmc$r AS (SELECT sub, cid, list(mv ORDER BY dim) AS cv
         |          FROM pm$r GROUP BY sub, cid),
         |pc$r AS (SELECT p.sub, p.cid, COALESCE(n.cv, p.cv) AS cv
         |         FROM pc${r - 1} p
         |         LEFT JOIN pmc$r n ON n.sub = p.sub AND n.cid = p.cid)""".stripMargin
    }
    val tail = s"""cb AS (SELECT sub, cv,
      |    ROW_NUMBER() OVER (PARTITION BY sub ORDER BY cid) - 1 AS code
      |  FROM pc$iters)""".stripMargin
    (Seq(base) ++ rounds ++ Seq(tail)).mkString(",\n")
  }

  /** PQ-encode + per-query LUT tail shared by the PQ oracles: `enc`
    * assigns each `sv` row its dense code, `lutq` is the grid-floored
    * query distance table.
    */
  private def pqSearchCtes: String = {
    def l2(a: String, b: String) = SimOracle.l2Sql(a, b)
    s"""enc AS (SELECT id AS neighbor_id, sub, code FROM (
      |    SELECT s.vec_id AS id, s.sub, c.code,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
      |        ORDER BY ${l2("s.svec", "c.cv")} ASC, c.code) AS rk
      |    FROM sv s JOIN cb c ON c.sub = s.sub) WHERE rk = 1),
      |lutq AS (SELECT s.vec_id AS query_id, c.sub, c.code,
      |    CAST(FLOOR(${l2("s.svec", "c.cv")} * 1000000.0) AS BIGINT) AS d
      |  FROM sv s JOIN cb c ON c.sub = s.sub WHERE s.vec_id < 10)""".stripMargin
  }

  private[graft] def pqCtes(m: Int, ksub: Int, iters: Int, subDim: Int): String =
    pqTrainCtes(m, ksub, iters, subDim, "v", "v") + ",\n" + pqSearchCtes

  private def bruteforceSql: String = s"""WITH $vecsCte,
      |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id, ${cosSql("q.qv", "c.v")} AS cos
      |  FROM q JOIN v c ON c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, cos FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_topk_heap" -> bruteforceSql,
    "sim_topk_bruteforce" -> s"""WITH $vecsCte,
      |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id, ${cosSql("q.qv", "c.v")} AS cos
      |  FROM q JOIN v c ON c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, cos FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_topk_lsh" -> s"""WITH $vecsCte,
      |b AS (SELECT vec_id, v, CAST(${bucketSql("v")} AS BIGINT) AS bucket FROM v),
      |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id, c.bucket,
      |         ${cosSql("q.qv", "c.v")} AS cos
      |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, bucket, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, bucket, rank, cos FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_topk_int8" -> s"""WITH $vecsCte,
      |qz AS (SELECT vec_id, ${SimOracle.int8Sql("v")} AS qv FROM v),
      |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id,
      |         ${SimOracle.intDotSql("q.qq", "c.qv")} AS idot
      |  FROM q JOIN qz c ON c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, idot,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY idot DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, idot FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_topk_pq" -> s"""WITH $vecsCte,
      |${pqCtes(PqM, PqKsub, PqIters, Dims / PqM)},
      |adist AS (
      |  SELECT l.query_id, e.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adist
      |  FROM enc e JOIN lutq l ON l.sub = e.sub AND l.code = e.code
      |  WHERE e.neighbor_id <> l.query_id
      |  GROUP BY l.query_id, e.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY adist ASC, neighbor_id) AS rank
      |  FROM adist)
      |SELECT query_id, neighbor_id, rank, adist FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_topk_ivfpq" -> ivfPqSql,
    // reload+search is result-identical to train+search — same oracle
    "sim_topk_ivfpq_indexed" -> ivfPqSql,
    "sim_topk_pq_indexed" -> s"""WITH $vecsCte,
      |${pqCtes(PqM, PqKsub, PqIters, Dims / PqM)},
      |adist AS (
      |  SELECT l.query_id, e.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adist
      |  FROM enc e JOIN lutq l ON l.sub = e.sub AND l.code = e.code
      |  WHERE e.neighbor_id <> l.query_id
      |  GROUP BY l.query_id, e.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY adist ASC, neighbor_id) AS rank
      |  FROM adist)
      |SELECT query_id, neighbor_id, rank, adist FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_topk_ivfpq_appended" -> ivfPqAppendedSql,
    "sim_topk_ivf" -> s"""WITH $vecsCte,
      |${lloydCtes(IvfK, IvfIters)},
      |cent AS (SELECT cid, cv FROM cent$IvfIters),
      |assigned AS (
      |  SELECT id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent)
      |  WHERE crank = 1),
      |q AS (SELECT v.vec_id AS query_id, v.v AS qv, a.cid
      |      FROM v JOIN assigned a ON a.id = v.vec_id WHERE v.vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, c.vec_id AS neighbor_id, q.cid,
      |         ${cosSql("q.qv", "c.v")} AS cos
      |  FROM q JOIN assigned a USING (cid) JOIN v c ON c.vec_id = a.id
      |  WHERE c.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cid, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cid, rank, cos FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
  )

  /** Oracle for the daily-drop gate: coarse + residual-PQ trained on the
    * even-id HALF (day A), the union corpus encoded against those trained
    * artifacts — exactly what the engine's exactly-once append holds.
    * Tail (probes/LUT/ADC rank) identical to [[ivfPqSql]].
    */
  private lazy val ivfPqAppendedSql: String = {
    val subDim = Dims / PqM
    s"""WITH $vecsCte,
      |vA AS (SELECT vec_id, v FROM v WHERE vec_id % 2 = 0),
      |${lloydCtes(IvfPqNlist, IvfIters, "vA")},
      |cent AS (SELECT cid, cv FROM cent$IvfIters),
      |assigned AS (
      |  SELECT id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent)
      |  WHERE crank = 1),
      |rv AS (SELECT v.vec_id, a.cid,
      |    list_transform(range(1, len(v.v) + 1), i -> v.v[i] - c.cv[i]) AS rv
      |  FROM v JOIN assigned a ON a.id = v.vec_id JOIN cent c ON c.cid = a.cid),
      |rvA AS (SELECT vec_id, cid, rv FROM rv WHERE vec_id % 2 = 0),
      |${pqTrainCtes(PqM, PqKsub, PqIters, subDim, "rvA", "rv")},
      |svAll AS (SELECT vec_id, sub,
      |    rv[(sub * $subDim + 1):(sub * $subDim + $subDim)] AS svec
      |  FROM rv CROSS JOIN subs),
      |enc AS (SELECT id AS neighbor_id, sub, code FROM (
      |    SELECT s.vec_id AS id, s.sub, c.code,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
      |        ORDER BY ${SimOracle.l2Sql("s.svec", "c.cv")} ASC, c.code) AS rk
      |    FROM svAll s JOIN cb c ON c.sub = s.sub) WHERE rk = 1),
      |ccodes AS (SELECT e.neighbor_id, r.cid, e.sub, e.code
      |  FROM enc e JOIN rv r ON r.vec_id = e.neighbor_id),
      |probes AS (
      |  SELECT id AS query_id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent WHERE v.vec_id < 10)
      |  WHERE crank <= $IvfPqNprobe),
      |qrv AS (SELECT p.query_id, p.cid,
      |    list_transform(range(1, len(v.v) + 1), i -> v.v[i] - c.cv[i]) AS qv2
      |  FROM probes p JOIN v ON v.vec_id = p.query_id JOIN cent c ON c.cid = p.cid),
      |qsv AS (SELECT query_id, cid, sub,
      |    qv2[(sub * $subDim + 1):(sub * $subDim + $subDim)] AS svec
      |  FROM qrv CROSS JOIN subs),
      |lut AS (SELECT q.query_id, q.cid, c.sub, c.code,
      |    CAST(FLOOR(${SimOracle.l2Sql("q.svec", "c.cv")} * 1000000.0) AS BIGINT) AS d
      |  FROM qsv q JOIN cb c ON c.sub = q.sub),
      |adist AS (
      |  SELECT l.query_id, cc.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adist
      |  FROM ccodes cc
      |  JOIN lut l ON l.cid = cc.cid AND l.sub = cc.sub AND l.code = cc.code
      |  WHERE cc.neighbor_id <> l.query_id
      |  GROUP BY l.query_id, cc.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY adist ASC, neighbor_id) AS rank
      |  FROM adist)
      |SELECT query_id, neighbor_id, rank, adist FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  private lazy val ivfPqSql: String = s"""WITH $vecsCte,
      |${lloydCtes(IvfPqNlist, IvfIters)},
      |cent AS (SELECT cid, cv FROM cent$IvfIters),
      |assigned AS (
      |  SELECT id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent)
      |  WHERE crank = 1),
      |rv AS (SELECT v.vec_id, a.cid,
      |    list_transform(range(1, len(v.v) + 1), i -> v.v[i] - c.cv[i]) AS rv
      |  FROM v JOIN assigned a ON a.id = v.vec_id JOIN cent c ON c.cid = a.cid),
      |${pqTrainCtes(PqM, PqKsub, PqIters, Dims / PqM, "rv", "rv")},
      |enc AS (SELECT id AS neighbor_id, sub, code FROM (
      |    SELECT s.vec_id AS id, s.sub, c.code,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
      |        ORDER BY ${SimOracle.l2Sql("s.svec", "c.cv")} ASC, c.code) AS rk
      |    FROM sv s JOIN cb c ON c.sub = s.sub) WHERE rk = 1),
      |ccodes AS (SELECT e.neighbor_id, r.cid, e.sub, e.code
      |  FROM enc e JOIN rv r ON r.vec_id = e.neighbor_id),
      |probes AS (
      |  SELECT id AS query_id, cid FROM (
      |    SELECT v.vec_id AS id, cent.cid,
      |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
      |        ORDER BY ${cosSql("v.v", "cent.cv")} DESC, cent.cid) AS crank
      |    FROM v CROSS JOIN cent WHERE v.vec_id < 10)
      |  WHERE crank <= $IvfPqNprobe),
      |qrv AS (SELECT p.query_id, p.cid,
      |    list_transform(range(1, len(v.v) + 1), i -> v.v[i] - c.cv[i]) AS qv2
      |  FROM probes p JOIN v ON v.vec_id = p.query_id JOIN cent c ON c.cid = p.cid),
      |qsv AS (SELECT query_id, cid, sub,
      |    qv2[(sub * ${Dims / PqM} + 1):(sub * ${Dims / PqM} + ${Dims / PqM})] AS svec
      |  FROM qrv CROSS JOIN subs),
      |lut AS (SELECT q.query_id, q.cid, c.sub, c.code,
      |    CAST(FLOOR(${SimOracle.l2Sql("q.svec", "c.cv")} * 1000000.0) AS BIGINT) AS d
      |  FROM qsv q JOIN cb c ON c.sub = q.sub),
      |adist AS (
      |  SELECT l.query_id, cc.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adist
      |  FROM ccodes cc
      |  JOIN lut l ON l.cid = cc.cid AND l.sub = cc.sub AND l.code = cc.code
      |  WHERE cc.neighbor_id <> l.query_id
      |  GROUP BY l.query_id, cc.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY adist ASC, neighbor_id) AS rank
      |  FROM adist)
      |SELECT query_id, neighbor_id, rank, adist FROM ranked
      |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
}
