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
  def coOccurrenceEdges(df: DataFrame, keyCol: String, itemCol: String): DataFrame =
    groupPairs(df, keyCol, itemCol).select("src", "dst").distinct()

  /** One ordered (src < dst) row per (group, item-pair): collect each
    * group's distinct items into a sorted array and expand the pairs
    * in-group with higher-order functions — ONE exchange (the group-key
    * groupBy) plus whatever the consumer aggregates, where the
    * self-join formulation paid two distinct exchanges, a join exchange,
    * and a second scan of the input (measured 8.1 s → 1.3 s on the sf0.1
    * substrate). Pair count is quadratic in GROUP SIZE either way — the
    * operator's contract is bounded groups (order baskets, shingle
    * buckets), same as before.
    */
  /** JVM kernel for the in-group ordered-pair expansion of a sorted long
    * array — the higher-order `flatten(transform(...))` expression form is
    * interpreted (not codegen'd) and measured ~25% slower end-to-end on
    * the sf0.1 substrate build.
    */
  private val longPairsUdf = udf { items: Seq[Long] =>
    val n = items.length
    // size arithmetic in Long: at n = 65,537 the Int form overflows negative
    // and dies as NegativeArraySizeException mid-job. The bounded-groups
    // contract (order baskets, shingle buckets) is ENFORCED here with an
    // actionable error naming the offending group size — a hot key at 100x
    // scale must fail loudly, not crash cryptically (and a group this size
    // means the caller forgot to cap/salt upstream; materializing ~2^31
    // pairs would be wrong on any engine).
    val pairs = n.toLong * (n - 1) / 2
    require(pairs <= Int.MaxValue,
      s"co-occurrence group of $n items would expand to $pairs pairs; " +
        "cap or salt the group key upstream (bounded-groups contract)")
    val out = new Array[(Long, Long)](pairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { out(k) = (items(i), items(j)); k += 1; j += 1 }
      i += 1
    }
    out
  }

  private def groupPairs(df: DataFrame, keyCol: String, itemCol: String): DataFrame = {
    // NO Parallelism.widen here, deliberately (r18): widening the
    // projected (k, i) rows before the group collect was tried — the
    // groupBy's map side runs at the scan's 3 splits at sf0.1 (2.0 s
    // stage) — and measured ×1.25 SLOWER end-to-end
    // (graph_substrate_build 3.86 → 4.82 s min-of-3, interleaved A/B):
    // a keyless repartition first pays a local sort of its input
    // (sortBeforeRepartition, guide §2.5) and a full extra exchange of
    // every row, which costs more than the under-parallelized partial
    // collect it spreads. Unlike the profile/substring kernels (pure
    // per-row CPU), this stage's work is the shuffle write itself.
    val grouped = df.select(col(keyCol).as("k"), col(itemCol).as("i"))
      .groupBy("k").agg(sort_array(collect_set(col("i"))).as("items"))
    df.schema(itemCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        grouped.select(col("k"), explode(longPairsUdf(col("items"))).as("e"))
          .select(col("k"), col("e._1").as("src"), col("e._2").as("dst"))
      case _ =>
        // generic item types (CLI-supplied columns) stay on the
        // expression form
        grouped.select(col("k"), explode(expr(
          """flatten(transform(items, (x, ix) ->
            |  transform(slice(items, ix + 2, size(items)),
            |    y -> struct(x AS src, y AS dst))))""".stripMargin)).as("e"))
          .select(col("k"), col("e.src").as("src"), col("e.dst").as("dst"))
    }
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
      when(srcLower, col("dst")).otherwise(col("src")).as("w"))

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

  /** PageRank grid: contributions are quantized to 1e-9 before the
    * per-node sum (BIGINT addition is order-free), so every round's rank
    * vector is bit-identical on any partitioning and re-derivable by any
    * engine — the same determinism device as the Lloyd codebook means.
    */
  val PrScale = 1000000000L
  val PrDamping = 0.85
  val PrIters = 3

  /** Fixed-iteration PageRank on an undirected (src < dst) edge list (each
    * edge contributes in both directions). Every node starts at rank 1;
    * rank_{t+1}(v) = (1-d) + d * Σ_{u→v} q(rank_t(u) / outdeg(u)) with
    * q = floor-to-1e-9 quantization applied to each contribution BEFORE
    * the sum.
    *
    * Scale shape per round: one join of the rank vector against the edge
    * list on the source key + one groupBy on the destination key — the
    * canonical Pregel round as two shuffles, nothing driver-side (the loop
    * is just plan construction; `localCheckpoint` truncates the growing
    * lineage each round exactly like `trainCentroids`). Degenerate "rank
    * sinks" don't arise on an undirected graph (every endpoint has
    * degree ≥ 1).
    */
  def pageRank(edges: DataFrame, iters: Int = PrIters,
      damping: Double = PrDamping): DataFrame =
    pageRankSnapshots(edges, Seq(iters), damping)(iters)

  /** One fixpoint pass, snapshotting the rank vector after each requested
    * round — the ScaleInvariants contraction certificate needs rounds
    * (k, k+1, k+2), and re-running the whole fixpoint once per round
    * triples the dominant cost (each round is a data-sized join+groupBy;
    * 100× probe: ~60 s/round). Snapshots are the loop's own
    * [[graft.plans.Lineage.cut]] tables, kept persisted; round 0 is the
    * uniform start vector.
    */
  def pageRankSnapshots(edges: DataFrame, rounds: Seq[Int],
      damping: Double = PrDamping): Map[Int, DataFrame] = {
    require(rounds.nonEmpty && rounds.forall(_ >= 0),
      s"rounds must be non-negative: $rounds")
    // checkpoint the directed edge list: every round joins against it, and
    // a lazy plan would re-run the upstream edge construction (the
    // co-occurrence self-join) once per round. (Pre-partitioning it on `u`
    // was tried and measured SLOWER at the 10x probe — the extra up-front
    // shuffle isn't amortized because AQE re-plans each round's join
    // anyway.)
    val dir = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
    // fold outdeg INTO the directed edge list once, up front: outdeg is a
    // per-u constant, so carrying it on each (u, v) row turns every round's
    // `dir ⋈ ranks ⋈ deg` (two joins) into a single `dir ⋈ ranks` join —
    // half the per-round join work, and the only per-round shuffles left
    // are the canonical Pregel pair (join on u, groupBy on v).
    // outdeg comes from a partial-agg'd groupBy joined back (AQE sees the
    // aggregate's true runtime size and broadcasts it) — the former
    // count-over-window forced a full exchange + sort of the edge list
    // (22 MB sorted at sf0.1) for a value a metadata-sized join provides
    val deg = dir.groupBy("u").agg(count(lit(1)).as("outdeg"))
    val dirDeg = dir.join(deg, Seq("u"))
      .transform(graft.plans.Lineage.cut)
    // deg already holds one row per node — no separate distinct pass
    var ranks = deg.select(col("u").as("node"), lit(1.0).as("pr"))
      .transform(graft.plans.Lineage.cut)
    val keep = rounds.toSet
    val out = scala.collection.mutable.Map.empty[Int, DataFrame]
    if (keep(0)) out(0) = ranks
    var prevKept = keep(0)
    val roundLog = graft.plans.RoundLog.timer(edges.sparkSession, "pagerank")
    for (it <- 1 to rounds.max) {
      val contrib = dirDeg
        .join(ranks.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node"),
          floor(col("pr") / col("outdeg") * PrScale).cast("long").as("qc"))
      val next = contrib.groupBy("node")
        .agg((lit(1.0) - damping) +
          lit(damping) * (sum("qc").cast("double") / PrScale) as "pr")
        .transform(graft.plans.Lineage.cut)
      if (!prevKept) ranks.unpersist()
      ranks = next
      prevKept = keep(it)
      if (prevKept) out(it) = next
      roundLog(it, "")
    }
    dirDeg.unpersist()
    out.toMap
  }

  /** Top-20 parts by PageRank in the co-purchase graph (deterministic
    * (pr desc, node) order) — the "most central catalog items" report.
    */
  def pageRankTop(edges: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pageRank(edges)
      .orderBy(col("pr").desc, col("node")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("pr").desc, col("node"))))
      // BIGINT rank: the oracle's row_number is int64, gate hash is width-exact
      .select(col("rank").cast("long").as("rank"), col("node"), col("pr"))
  }

  /** Co-occurrence edges seen in at least `minSupport` distinct groups —
    * the thresholded ("frequently bought together") graph. Support counting
    * is one groupBy on the (src, dst) pair after the co-partitioned
    * self-join; because (k, item) rows are distinct, `count(*)` per pair IS
    * the distinct-group support. At scale the threshold is what keeps the
    * graph sparse: raw co-occurrence on web-scale baskets is a hairball,
    * support ≥ s prunes it to the signal edges before any graph algorithm
    * runs — the same shape as a shuffle-once frequent-itemset pass.
    */
  def frequentCoEdges(df: DataFrame, keyCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    groupPairs(df, keyCol, itemCol)
      .groupBy("src", "dst").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select("src", "dst")

  /** Connected components of an undirected (src, dst) edge list — the
    * public graph form of the star-contraction kernel the dedup clustering
    * runs ([[graft.dedup.Dedup.connectedComponents]]: alternating
    * large-star/small-star, O(log n) rounds, exact post-verification
    * against the input edges). Vertices are the edge endpoints; returns
    * one (node, component) row per vertex with `component` = min node id
    * in its component.
    */
  def components(edges: DataFrame): DataFrame = {
    val verts = edges.select(col("src").cast("long").as("id"))
      .unionByName(edges.select(col("dst").cast("long").as("id")))
      .distinct()
    graft.dedup.Dedup.connectedComponents(
        edges.select(col("src").as("doc_a"), col("dst").as("doc_b")), verts)
      .select(col("id").as("node"), col("component"))
  }

  /** Gate support threshold: pairs co-occurring in ≥ 2 orders. */
  val CcMinSupport = 2L

  /** k-core subgraph of an undirected (src < dst) edge list: iteratively
    * peel nodes of induced-degree < k until fixpoint; returns the
    * surviving (node, degree-within-core) rows. Classic iterative
    * refinement: each round is one groupBy (degrees) + two semi joins
    * (restrict both endpoints to survivors) — all keyed on node id, no
    * driver-side graph state; lineage cut per round ([[graft.plans.Lineage]],
    * so cluster runs can elect reliable checkpoints). Early-stops on
    * fixpoint (directed-edge count unchanged); bounded by `maxRounds` —
    * a round count both the engine and the unrolled-CTE oracle share, so
    * results agree even on inputs that haven't converged by the bound
    * (post-fixpoint rounds are identities).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = KcoreRounds): DataFrame = {
    // cutCounted fuses the lineage cut and the convergence count into ONE
    // action per round (previously an eager cut + a count = two stage
    // waves per round — the r5 verdict's carried perf note)
    var (dir, m) = graft.plans.Lineage.cutCounted(
      edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v"))))
    var round = 0
    var converged = false
    val roundLog = graft.plans.RoundLog.timer(edges.sparkSession, "kcore")
    while (!converged && round < maxRounds) {
      val keep = dir.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("u")
      val (next, m2) = graft.plans.Lineage.cutCounted(
        dir.join(keep, Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi"))
      roundLog(round, s"dir_edges=$m2")
      dir.unpersist()
      dir = next
      converged = m2 == m
      m = m2
      round += 1
    }
    dir.groupBy(col("u").cast("long").as("node"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Gate core order and round bound (sf0.01 reaches fixpoint in 11). */
  val KcoreK = 3
  val KcoreRounds = 12

  /** Multi-source BFS levels: `level(v)` = fewest hops from any source.
    * Per round: frontier ⋈ edges (one equi-join keyed on node id), a
    * distinct, and an anti-join against the visited set — the canonical
    * frontier-expansion shape where per-round work is proportional to the
    * FRONTIER's edge neighborhood, not the graph. Early-stops when the
    * frontier empties; bounded by `maxRounds`, which the unrolled oracle
    * shares (post-exhaustion rounds are no-ops, so early stop and fixed
    * unroll agree on any input — the [[kCore]] argument). Lineage cut per
    * round (reliable-checkpoint eligible). Unreached nodes are absent.
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame,
      maxRounds: Int = BfsRounds): DataFrame = {
    val dir = graft.plans.Lineage.cut(
      edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
        .unionByName(edges.select(col("dst").cast("long").as("u"),
          col("src").cast("long").as("v"))))
    val level0 = graft.plans.Lineage.cut(
      sources.select(col("id").cast("long").as("node")).distinct()
        .withColumn("level", lit(0L)))
    // `visited` is a lazy UNION over the per-round cut frontiers — never
    // re-materialized. The anti-join scans the same total rows a merged
    // visited table would, the plan depth is bounded by maxRounds, and
    // the per-round cost drops from three actions (cut next, isEmpty,
    // cut grown) to ONE (cutCounted of next). The returned frame is that
    // union, so every retained frontier block-set is part of the result;
    // the only superseded block-set (the final empty `next`) is
    // unpersisted on the done branch — the r5 ADVICE leak.
    var visited = level0
    var frontier = level0
    var r = 1
    var done = false
    val roundLog = graft.plans.RoundLog.timer(edges.sparkSession, "bfs")
    while (!done && r <= maxRounds) {
      val (next, n) = graft.plans.Lineage.cutCounted(
        dir.join(frontier.select(col("node").as("u")), Seq("u"))
          .select(col("v").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("level", lit(r.toLong)))
      roundLog(r, s"frontier=$n")
      if (n == 0L) {
        next.unpersist()
        done = true
      } else {
        visited = visited.unionByName(next)
        frontier = next
      }
      r += 1
    }
    dir.unpersist()
    visited
  }

  /** Gate BFS bounds: sources = graph nodes ≡ 0 (mod 500); 8 rounds
    * comfortably past the co-occurrence graph's small diameter.
    */
  val BfsRounds = 8
  val BfsSrcMod = 500L

  /** The co-purchase substrate, computed ONCE per (session, sfDir) and
    * shared by every graph gate: the support-counted pair aggregate is
    * the expensive stage (pair expansion + count), and five of the six
    * gates derive from it — recomputing it per gate is what a 100 TB
    * deployment would never do (there it's a materialized table the
    * graph queries all read). The single-node stand-in is the same thing
    * a cluster would do: MATERIALIZE to parquet once and have every
    * consumer scan the columnar file. (An earlier `.cache()` memo pinned
    * the substrate in executor storage memory for the whole session and
    * replaced the parquet-rooted plans of triangles/pagerank with
    * repeated deserialized InMemoryTableScans — measurably slower than
    * the columnar scan, and not how a 100 TB deployment shares a
    * substrate anyway.) The memo holds only the path string; nothing is
    * pinned in memory, and the temp files live under target/ for the JVM
    * lifetime.
    */
  private val pairSupportMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def pairSupport(s: SparkSession, d: String): DataFrame = {
    val path = pairSupportMemo.getOrElseUpdate((s, d), {
      val p = new java.io.File(
        s"target/graft-substrate/pair_support_${java.util.UUID.randomUUID()}"
      ).getAbsolutePath
      groupPairs(Tables.lineitem(s, d), "l_orderkey", "l_partkey")
        .groupBy("src", "dst").agg(count(lit(1)).as("support"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Bench hook: force the one-time parquet materialization of the shared
    * pair substrate and return its row count. Timed as its own bench entry
    * so the amortization across the graph gates is explicit in the
    * artifact (the DuckDB comparison recomputes the substrate per query).
    */
  def buildSubstrate(s: SparkSession, d: String): Long =
    pairSupport(s, d).count()

  /** Incremental maintenance of the pair substrate — the daily-drop form
    * of [[buildSubstrate]] a 100 TB deployment runs instead of a rebuild.
    * Support = number of GROUPS containing both endpoints, so a delta
    * computed from new groups alone merges by per-(src, dst) SUM.
    * Precondition: groups arrive WHOLE (an order's items land in one
    * drop) — split groups would under-pair within the group, the same
    * whole-group contract every basket aggregate has. Spec-asserted:
    * merge(substrate(day1), delta(day2)) ≡ substrate(day1 ∪ day2).
    */
  def substrateDelta(newRows: DataFrame, keyCol: String,
      itemCol: String): DataFrame =
    groupPairs(newRows, keyCol, itemCol)
      .groupBy("src", "dst").agg(count(lit(1)).as("support"))

  /** Per-(src, dst) SUM merge of substrate tables (associative — daily
    * deltas fold in any order).
    */
  def mergeSubstrate(substrates: DataFrame*): DataFrame =
    substrates.reduce(_.unionByName(_))
      .groupBy("src", "dst").agg(sum(col("support")).as("support"))

  /** All distinct co-occurrence edges (support ≥ 1) off the shared
    * substrate — same rows as [[coOccurrenceEdges]] on the gate input.
    */
  private[graft] def gateEdges(s: SparkSession, d: String): DataFrame =
    pairSupport(s, d).select("src", "dst")

  /** Support-filtered edges off the shared substrate — same rows as
    * [[frequentCoEdges]] on the gate input.
    */
  private def gateFreqEdges(s: SparkSession, d: String): DataFrame =
    pairSupport(s, d).filter(col("support") >= CcMinSupport)
      .select("src", "dst")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> ((s, d) => triangleCount(gateEdges(s, d))),
    "q_pagerank" -> ((s, d) =>
      pageRankTop(gateEdges(s, d), 20).orderBy("rank")),
    "q_components" -> ((s, d) =>
      components(gateFreqEdges(s, d)).orderBy("node")),
    "q_kcore" -> ((s, d) =>
      kCore(gateFreqEdges(s, d), KcoreK).orderBy("node")),
    // market-basket surface of the pair substrate: strongest co-purchase
    // pairs by distinct-order support — global top-k is
    // TakeOrderedAndProject over the pair-count aggregate, no global sort
    "q_copurchase_pairs" -> ((s, d) =>
      pairSupport(s, d)
        .orderBy(col("support").desc, col("src"), col("dst"))
        .limit(20)),
    "q_bfs_levels" -> ((s, d) => {
      val edges = gateFreqEdges(s, d)
      val srcs = edges.select(col("src").cast("long").as("id"))
        .unionByName(edges.select(col("dst").cast("long").as("id")))
        .filter(col("id") % BfsSrcMod === 0).distinct()
      bfsLevels(edges, srcs).orderBy("node")
    }),
    // incremental maintenance hash-checked cross-engine: build the pair
    // substrate as two daily drops (orders split by key parity — groups
    // arrive whole) delta'd and merged; the oracle rebuilds from scratch,
    // so the gate passes only if merge(delta(day1), delta(day2)) is
    // byte-equal to the full rebuild
    "graph_substrate_incremental" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      mergeSubstrate(
        substrateDelta(li.filter(col("l_orderkey") % 2 === 0),
          "l_orderkey", "l_partkey"),
        substrateDelta(li.filter(col("l_orderkey") % 2 === 1),
          "l_orderkey", "l_partkey"))
        .orderBy("src", "dst")
    }))

  private val edgeCte =
    """e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      |      FROM lineitem a JOIN lineitem b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""".stripMargin

  /** Unrolled PageRank rounds — the SQL twin of [[pageRank]]: identical
    * quantize-before-sum arithmetic, and the teleport term is written
    * `(1.0 - 0.85)` (not the literal 0.15) because IEEE `1.0 - 0.85`
    * differs from the nearest double to 0.15 by one ulp and the Spark side
    * computes the subtraction.
    */
  private def prRounds(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT d.v AS node,
         |    (CAST(1.0 AS DOUBLE) - CAST($PrDamping AS DOUBLE)) + CAST($PrDamping AS DOUBLE) *
         |      (CAST(SUM(CAST(FLOOR(r.pr / g.outdeg * $PrScale) AS BIGINT)) AS DOUBLE) / $PrScale) AS pr
         |  FROM dir d JOIN r${i - 1} r ON r.node = d.u JOIN deg g ON g.u = d.u
         |  GROUP BY d.v)""".stripMargin
    }
    rounds.mkString(",\n")
  }

  /** Oracles: triangles via the canonical a<b<c triple join — a different
    * (quadratic-wedge) algorithm, which is the point: two independent
    * formulations must agree on the exact count. PageRank via unrolled
    * rounds over the same quantized grid.
    */
  val oracles: Map[String, String] = Map(
    // full-rebuild support counts: distinct (order, part) rows self-joined
    // in-group — the incremental merge must reproduce these exactly
    "graph_substrate_incremental" -> """
      |WITH di AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem)
      |SELECT a.i AS src, b.i AS dst, CAST(COUNT(*) AS BIGINT) AS support
      |FROM di a JOIN di b ON a.k = b.k AND a.i < b.i
      |GROUP BY a.i, b.i ORDER BY src, dst""".stripMargin,
    "q_triangles" -> s"""
      |WITH $edgeCte
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |FROM e e1
      |JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      |JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb""".stripMargin,
    "q_pagerank" -> s"""
      |WITH $edgeCte,
      |dir AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS outdeg FROM dir GROUP BY u),
      |r0 AS (SELECT u AS node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
      |${prRounds(PrIters)}
      |SELECT rank, node, pr FROM (
      |  SELECT node, pr, row_number() OVER (ORDER BY pr DESC, node) AS rank
      |  FROM r$PrIters)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // components via recursive min-label closure — a different algorithm
    // than the Spark side's star contraction, which is the point: the
    // fixpoints of two independent formulations must agree exactly
    "q_components" -> s"""
      |WITH RECURSIVE e0 AS (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= $CcMinSupport),
      |nodes AS (SELECT DISTINCT u AS id FROM e0
      |          UNION SELECT DISTINCT v FROM e0),
      |edges AS (SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0),
      |reach(id, lab) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
      |SELECT CAST(id AS BIGINT) AS node, CAST(MIN(lab) AS BIGINT) AS component
      |FROM reach GROUP BY id ORDER BY node""".stripMargin,
    // k-core via unrolled peeling rounds sharing the engine's round bound:
    // rounds past the fixpoint are identities, so engine early-stop and
    // the oracle's fixed unroll agree on any input. Every CTE is
    // MATERIALIZED — each round references its predecessor twice, and
    // inlining would re-evaluate the chain exponentially
    "q_kcore" -> s"""
      |WITH e0 AS MATERIALIZED (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= $CcMinSupport),
      |dir AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |n0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM dir),
      |${(1 to KcoreRounds).map(r =>
          s"""n$r AS MATERIALIZED (SELECT u AS id FROM dir
             |  JOIN n${r - 1} a ON u = a.id JOIN n${r - 1} b ON v = b.id
             |  GROUP BY u HAVING COUNT(*) >= $KcoreK)""".stripMargin)
         .mkString(",\n")}
      |SELECT CAST(u AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS degree
      |FROM dir JOIN n$KcoreRounds a ON u = a.id JOIN n$KcoreRounds b ON v = b.id
      |GROUP BY u ORDER BY node""".stripMargin,
    "q_copurchase_pairs" -> s"""
      |SELECT a.l_partkey AS src, b.l_partkey AS dst,
      |  CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS support
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY support DESC, src, dst LIMIT 20""".stripMargin,
    // BFS levels via unrolled frontier rounds (MATERIALIZED — each round
    // reads its predecessor's frontier and visited set)
    "q_bfs_levels" -> s"""
      |WITH e0 AS MATERIALIZED (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= $CcMinSupport),
      |dir AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |f0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM dir
      |  WHERE u % $BfsSrcMod = 0),
      |v0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS level FROM f0),
      |${(1 to BfsRounds).map(r =>
          s"""f$r AS MATERIALIZED (
             |  SELECT DISTINCT v AS node FROM dir JOIN f${r - 1} ON u = node
             |  EXCEPT SELECT node FROM v${r - 1}),
             |v$r AS MATERIALIZED (SELECT node, level FROM v${r - 1}
             |  UNION ALL SELECT node, CAST($r AS BIGINT) FROM f$r)""".stripMargin)
         .mkString(",\n")}
      |SELECT node, level FROM v$BfsRounds ORDER BY node""".stripMargin)
}
