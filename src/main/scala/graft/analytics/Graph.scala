package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed triangle counting over a co-occurrence graph — the graph
  * primitive behind community/cluster structure in a corpus (shared-shingle
  * doc graphs, co-purchase graphs). The reference has no graph surface at
  * all; this is a pure capability add in the SURVEY §2.12 "beyond the
  * reference" family.
  *
  * The algorithm is the degree-ordered (rank-orientation) form: orient every
  * undirected edge from its lower-(degree, id) endpoint to the higher one,
  * enumerate wedges only from each node's oriented out-neighborhood, and
  * close them against the oriented edge set. Out-degrees under this
  * orientation are O(sqrt(m)), so wedge volume is O(m^1.5) worst-case and
  * near-linear on skewed real graphs — a hub with 10^6 neighbors generates
  * NO wedges from itself (its edges all point inward), which is exactly the
  * property that keeps the plan alive at 100 TB. The naive closed-wedge
  * join on the raw adjacency would square the hub instead.
  *
  * Everything is equi-joins and groupBys on node/edge keys — no driver
  * state, no iteration; triangle identity arithmetic stays in longs.
  */
object Graph {

  /** Undirected co-occurrence edges: items sharing a group key, one
    * (src < dst) row per pair. Self-join is co-partitioned on the group
    * key (one shuffle); per-group pair count is quadratic in group SIZE,
    * which for order baskets is bounded (~line items per order).
    */
  def coOccurrenceEdges(df: DataFrame, keyCol: String, itemCol: String): DataFrame = {
    val a = df.select(col(keyCol).as("k"), col(itemCol).as("src")).distinct()
    val b = df.select(col(keyCol).as("k"), col(itemCol).as("dst")).distinct()
    a.join(b, "k")
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Exact global triangle count of an undirected (src < dst) edge list.
    * Returns one row: n_triangles.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // orient by (deg, id): u -> w with rank(u) < rank(w)
    val ranked = edges
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "ds"), "src")
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dd"), "dst")
    val srcLower = col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst"))
    val adj = ranked.select(
      when(srcLower, col("src")).otherwise(col("dst")).as("u"),
      when(srcLower, col("dst")).otherwise(col("src")).as("w"),
      when(srcLower, col("dd")).otherwise(col("ds")).as("dw"))

    // edge-iterator close: attach both endpoints' oriented out-neighbor
    // lists to every oriented edge and count the intersection locally.
    // Equivalent to the wedge join (a triangle {u,v,w} with rank
    // u<v<w appears exactly as w ∈ adj(u) ∩ adj(v) at edge (u,v)), but the
    // candidate wedges never hit an exchange: the only shuffled rows are
    // the m edges and the n adjacency lists (each out-list is O(sqrt(m))
    // under the orientation), and the intersection count is a single
    // codegen stage feeding a partial sum
    val adjList = adj.groupBy(col("u"))
      .agg(collect_list(col("w")).as("nbrs"))
    val closed = adj.select(col("u"), col("w"))
      .join(adjList, Seq("u"))
      .withColumnRenamed("nbrs", "nu")
      .join(adjList.withColumnRenamed("u", "w"), Seq("w"))
      .withColumnRenamed("nbrs", "nw")
    // edges are distinct, so the intersection size is an exact count
    closed
      .select(size(array_intersect(col("nu"), col("nw"))).cast("long").as("tri"))
      .agg(coalesce(sum("tri"), lit(0L)).as("n_triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> ((s, d) =>
      triangleCount(
        coOccurrenceEdges(Tables.lineitem(s, d), "l_orderkey", "l_partkey"))))

  /** Oracle counts each triangle once via the canonical a<b<c triple join —
    * a different (quadratic-wedge) algorithm, which is the point: two
    * independent formulations must agree on the exact count.
    */
  val oracles: Map[String, String] = Map(
    "q_triangles" -> """
      |WITH e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      |           FROM lineitem a JOIN lineitem b
      |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |FROM e e1
      |JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      |JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb""".stripMargin)
}
