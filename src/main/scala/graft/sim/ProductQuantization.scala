package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the IVF-PQ compression path every
  * billion-vector ANN system runs (Jégou et al., public technique): split
  * each vector into `m` contiguous subspaces, train a tiny L2 codebook per
  * subspace, and store each vector as `m` small codes. With m=4 and 8
  * centroids a 64-float vector becomes 4 codes — the corpus fits in a
  * fraction of the footprint, and query-time ranking is asymmetric distance
  * computation (ADC): per query, ONE m×ksub lookup table of exact
  * subspace distances, then each candidate costs m table lookups instead
  * of a d-dim float dot.
  *
  * Scale shape: training explodes vectors into (vector, subspace) rows so
  * all m codebooks train inside the SAME per-round shuffles (not m
  * sequential jobs); encoding is one shuffle on the vector id; the ADC scan
  * broadcasts the per-query LUTs and reads the code table ONCE — no
  * explode, no aggregation shuffle, rank-window only, exactly the
  * brute-force plan but over 4-code rows.
  *
  * Determinism: centroid means use the same 1e-6 BIGINT-grid trick as
  * [[Similarity.trainCentroids]] (order-free integer sums), L2 distances
  * fold in index order, and ADC distances are floored to a BIGINT grid
  * before the (order-free, integer) subspace sum — so codebooks, codes,
  * and rankings are bit-identical on any engine and the gate hash-checks
  * the whole train→encode→search path against a re-training DuckDB oracle.
  */
object ProductQuantization {

  /** Ascending-index L2² fold — oracle twin is `SimOracle.l2Sql`. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** ADC grid: subspace distances are floored to 1e-6 before summing. */
  val DistGrid = 1000000.0

  private def subVec(v: Column, sub: Int, subDim: Int): Column =
    slice(v, sub * subDim + 1, subDim)

  /** (keys…, sub, sv) — each vector exploded into its m subspace slices,
    * carrying the given key columns through.
    */
  private def subVectors(df: DataFrame, keyCols: Seq[String], vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.select(keyCols.map(col) :+ explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), subVec(col(vecCol), s, subDim).as("sv"))
      }: _*)).as("e"): _*)
      .select(keyCols.map(col) :+ col("e.sub").as("sub") :+
        col("e.sv").as("sv"): _*)

  /** Collapse per-(keys…, sub, code) grid distances `d` into one 2D
    * `lut[sub][code]` array per key tuple.
    */
  private def adcLut(subDists: DataFrame, keyCols: Seq[String]): DataFrame =
    subDists
      .groupBy((keyCols :+ "sub").map(col): _*)
      .agg(array_sort(collect_list(struct(col("code"), col("d")))).as("p"))
      .select(keyCols.map(col) :+ col("sub") :+
        transform(col("p"), x => x.getField("d")).as("row"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("sub"), col("row")))).as("q"))
      .select(keyCols.map(col) :+
        transform(col("q"), x => x.getField("row")).as("lut"): _*)

  /** ADC score: the integer sum of each code's looked-up subspace distance. */
  private def adcDist(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (cd, row) => element_at(row, (cd + 1).cast("int"))),
      lit(0L), (acc, x) => acc + x)

  /** Nearest-centroid assignment per (vector, subspace): L2 ascending,
    * ties to the lowest `ord` (cid during training, dense code after).
    */
  private def assignSub(sv: DataFrame, cents: DataFrame, ord: String): DataFrame = {
    val w = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("ld").asc, col(ord))
    sv.join(broadcast(cents), Seq("sub"))
      .withColumn("ld", l2Sq(col("sv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("sub"), col(ord))
  }

  /** Train the m per-subspace codebooks with `iters` Lloyd rounds (init =
    * the subspace slices of the `ksub` lowest-id vectors; empty centroids
    * keep their previous position). Returns (sub, code, cv) with `code`
    * 0-based dense per subspace.
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, ksub: Int, iters: Int): DataFrame = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val subDim = dims / m
    val sv = subVectors(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
      Seq("id"), "v", m, subDim).cache()
    val donors = corpus.select(col(idCol).as("id")).orderBy("id").limit(ksub)
    var cents = sv.join(broadcast(donors), Seq("id"))
      .select(col("sub"), col("id").as("cid"), col("sv").as("cv"))
      .transform(graft.plans.Lineage.cut)
    for (_ <- 1 to iters) {
      val assigned = assignSub(sv, cents, "cid")
      val means = sv.join(assigned, Seq("id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("sub", "cid", "dim")
        .agg((sum(floor(col("x") * DistGrid)).cast("double") /
          (count(lit(1)) * DistGrid)).as("mv"))
        .groupBy("sub", "cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("pairs"))
        .select(col("sub"), col("cid"),
          transform(col("pairs"), p => p.getField("mv")).as("cv"))
      val next = cents.alias("old")
        .join(means.alias("new"), Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("new.cv"), col("old.cv")).as("cv"))
        .transform(graft.plans.Lineage.cut)
      cents.unpersist()
      cents = next
    }
    sv.unpersist()
    cents.withColumn("code",
      (row_number().over(Window.partitionBy("sub").orderBy("cid")) - 1)
        .cast("long"))
      .select("sub", "code", "cv")
  }

  /** Encode each vector as its m nearest-centroid codes, ordered by
    * subspace: (id, codes array). One shuffle on the vector id.
    */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, dims: Int, m: Int): DataFrame = {
    val subDim = dims / m
    val sv = subVectors(
      vecs.select(col(idCol).as("id"), col(vecCol).as("v")),
      Seq("id"), "v", m, subDim)
    assignSub(sv, codebooks, "code")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("p"))
      .select(col("id"), transform(col("p"), x => x.getField("code")).as("codes"))
  }

  /** ADC top-k: per query one exact m×ksub distance table (grid-floored
    * BIGINTs), broadcast; candidates rank by the integer sum of their m
    * looked-up subspace distances (ascending, neighbor_id tiebreak).
    */
  def topK(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, k: Int): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, codebooks, dims, m)
      .select(col("id").as("neighbor_id"), col("codes"))
    pqSearch(queries, codes, codebooks, idCol, vecCol, dims, m, k)
  }

  /** The query half of [[topK]] over a prebuilt `(neighbor_id, codes)`
    * table: broadcast per-query LUTs, one codes-table scan, rank-window —
    * the corpus is never re-encoded (see [[AnnIndex.buildPq]] for the
    * persisted-index form).
    */
  def pqSearch(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, k: Int): DataFrame = {
    val subDim = dims / m
    // lut[sub][code] as a 2D array per query — one broadcast row per query
    val lut = adcLut(
      subVectors(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("v")),
        Seq("query_id"), "v", m, subDim)
        .join(broadcast(codebooks), Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          floor(l2Sq(col("sv"), col("cv")) * DistGrid).cast("long").as("d")),
      Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    codes.join(broadcast(lut), col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcDist(col("codes"), col("lut")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }

  /** Residuals against a coarse (cid, cv) codebook: each vector joined to
    * its top-1 cosine centroid ([[Similarity.ivfAssign]] semantics) minus
    * that centroid — (id, cid, rv). Narrow: assignment broadcasts the
    * centroids, the subtraction is per-row.
    */
  def residuals(vecs: DataFrame, coarse: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val assigned = Similarity.ivfAssign(vecs,
      coarse.select(col("cid").as(idCol), col("cv").as(vecCol)),
      idCol, vecCol)
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(assigned, Seq("id"))
      .join(broadcast(coarse), Seq("cid"))
      .select(col("id"), col("cid"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("rv"))
  }

  /** IVFADC (classic IVF-PQ, Jégou et al.): corpus vectors live in their
    * top-1 coarse list and are PQ-encoded as RESIDUALS against that list's
    * centroid; a query probes its `nprobe` nearest lists and ranks each
    * list's members by ADC against the query's residual FOR THAT LIST.
    *
    * This is the architecture that holds at 100 TB: the corpus is scanned
    * and encoded ONCE into (cid, 4-code) rows partitioned by list; a query
    * touches only nprobe lists via an equi-join on cid with a broadcast
    * (query, cid)-keyed LUT; and because a corpus vector lives in exactly
    * one list no (query, neighbor) pair can arise twice. Same BIGINT-grid
    * determinism as [[topK]] — the gate hash-checks coarse training,
    * residual PQ training, encoding, and probing end to end.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, coarse: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    val codes = encodeIvfPq(corpus, coarse, codebooks, idCol, vecCol, dims, m)
    ivfPqSearch(queries, codes, coarse, codebooks, idCol, vecCol,
      dims, m, k, nprobe)
  }

  /** The index-build half of [[ivfPqTopK]]: corpus → (neighbor_id, cid,
    * codes) rows — each vector's coarse list plus its residual PQ codes.
    * This is the artifact a 100 TB deployment computes ONCE and persists
    * (see [[AnnIndex]]); queries then touch only the code table.
    */
  def encodeIvfPq(corpus: DataFrame, coarse: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int): DataFrame = {
    val cres = residuals(corpus, coarse, idCol, vecCol)
    encode(cres, "id", "rv", codebooks, dims, m)
      .join(cres.select(col("id"), col("cid")), Seq("id"))
      .select(col("id").as("neighbor_id"), col("cid"), col("codes"))
  }

  /** The query half of [[ivfPqTopK]] over a prebuilt code table: probe the
    * `nprobe` nearest coarse lists, broadcast the per-(query, list) residual
    * LUTs, equi-join on `cid`, ADC-rank. The corpus is never re-encoded.
    */
  def ivfPqSearch(queries: DataFrame, codes: DataFrame, coarse: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    val subDim = dims / m
    val probes = Similarity.ivfAssignTop(queries,
      coarse.select(col("cid").as(idCol), col("cv").as(vecCol)),
      idCol, vecCol, nprobe)
      .withColumnRenamed("id", "query_id")
    val qres = queries.select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .join(probes, Seq("query_id"))
      .join(broadcast(coarse), Seq("cid"))
      .select(col("query_id"), col("cid"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("rv"))
    val lut = adcLut(
      subVectors(qres, Seq("query_id", "cid"), "rv", m, subDim)
        .join(broadcast(codebooks), Seq("sub"))
        .select(col("query_id"), col("cid"), col("sub"), col("code"),
          floor(l2Sq(col("sv"), col("cv")) * DistGrid).cast("long").as("d")),
      Seq("query_id", "cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    codes.join(broadcast(lut), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcDist(col("codes"), col("lut")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }
}
