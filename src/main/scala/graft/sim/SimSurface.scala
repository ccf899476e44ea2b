package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing bundle for similarity search over `embeddings`. */
object SimSurface {

  val Dims = 64
  val Planes = 8
  val K = 10

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
    "sim_topk_ivf" -> ((s, d) =>
      Similarity.ivfTopK(queriesD(s, d), vecsD(s, d),
        vecsD(s, d).filter(col("vec_id") % 50 === 0), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
    // bounded-heap partial-aggregate form — result-identical to the window
    // form, so it shares the brute-force oracle
    "sim_topk_heap" -> ((s, d) =>
      Similarity.heapTopK(queriesD(s, d), vecsD(s, d), "vec_id", "v", K)
        .orderBy("query_id", "rank")),
  )

  // ---- DuckDB mirrors ----

  private val vecsCte =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |     FROM embeddings)""".stripMargin

  private def cosSql(a: String, b: String): String = SimOracle.cosSql(a, b)

  private def bucketSql(v: String): String = SimOracle.bucketSql(v, Planes, Dims)

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
      |b AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM v),
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
    "sim_topk_ivf" -> s"""WITH $vecsCte,
      |cent AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id % 50 = 0),
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
}
