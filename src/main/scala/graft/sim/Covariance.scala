package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact distributed covariance of an embedding column — the statistics
  * pass feeding PCA/whitening on corpus embeddings. The scale problem: a
  * d-dimensional covariance needs d(d+1)/2 cross-moments, and the naive
  * per-row pair EXPLODE ships d²/2 rows per vector through a shuffle (at
  * d=64, 2080× the data). Here the whole Gram accumulation is ONE typed
  * [[Aggregator]] whose buffer is a single long[] of d(d+1)/2+d+1 cells —
  * a true partial aggregate: each partition collapses to one buffer
  * map-side, the exchange carries one buffer per partition, merges are
  * elementwise adds.
  *
  * Exactness: elements quantize to the decimal(.,4) grid (the engine's
  * standard), so sums and cross-sums are exact BIGINTs on any
  * partitioning; the final per-pair covariance arithmetic runs in
  * DECIMAL(38) (`n·S_ij − S_i·S_j` overflows BIGINT around n≈2·10⁵ at
  * this grid) and the double covariance is one fixed-order expression of
  * those exact integers — value-identical in the oracle, and since round
  * 6 width-identical too (`i`/`j` emit as BIGINT like the oracle's
  * unnest; the round-5 gate was value-exact but int32-red).
  *
  * The eigen step (PCA proper) is deliberately driver-side: a d×d matrix
  * is KB-sized whatever the corpus, so distributing Jacobi rotations
  * would be pure overhead — the cluster's job ends at the exact moment
  * matrix; see [[pcaFromCovariance]] (spec-checked: orthonormal basis,
  * descending eigenvalues, reconstruction bound).
  */
object Covariance {

  /** Gram/moment buffer over quantized vectors: [n, S_0..S_{d-1},
    * S_00, S_01, ..] (upper triangle row-major).
    */
  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    private val tri = d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](1 + d + tri)
    override def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
      val v = x.toArray
      b(0) += 1L
      var i = 0
      var t = 1 + d
      while (i < d) {
        b(1 + i) += v(i)
        var j = i
        while (j < d) { b(t) += v(i) * v(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Quantized-grid scale: decimal(.,4), matching the engine playbook. */
  val GridScale = 10000L

  /** Upper-triangle covariance rows `(i, j, n, s_i, s_j, s_ij, cov)` for
    * a fixed-width `array<float>` column: one aggregation pass, then the
    * d(d+1)/2-row moment explosion happens on the SINGLE result row.
    * `cov = (n·S_ij − S_i·S_j) / (n²·10⁸)` — the population covariance on
    * the quantized grid. The `n·S_ij − S_i·S_j` numerator is computed in
    * DECIMAL(38,0) (it overflows BIGINT around n≈2·10⁵ at this grid) but
    * stays INTERNAL: the output carries only BIGINT moments and the
    * float64 `cov`, because decimal columns hash differently across
    * DuckDB versions in the driver's gate pipeline (the r5/r6 red was a
    * decimal-rendering artifact on value-exact rows).
    */
  def covarianceUpper(vecs: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val quantized = vecs
      .select(transform(col(vecCol),
        x => (x.cast("double").cast("decimal(18,4)") * GridScale).cast("long"))
        .as("q"))
      .filter(size(col("q")) === dim)
      .as[Seq[Long]]
    val agg = new GramAgg(dim)
    val row = quantized.select(agg.toColumn).toDF("m")
    // expand (i, j) over the single moment row; index arithmetic mirrors
    // the buffer layout
    val pairs = (0 until dim).flatMap(i => (i until dim).map(j => (i, j)))
    val pairDf = spark.createDataFrame(pairs.map { case (i, j) =>
      val t = 1 + dim + (i * (2 * dim - i + 1)) / 2 + (j - i)
      (i, j, t)
    }).toDF("i", "j", "t")
    row.crossJoin(broadcast(pairDf))
      // i/j emit as BIGINT: the index columns are Int for element_at's
      // array-index arithmetic, but the output contract is int64 (the
      // oracle's unnest produces BIGINT and the gate hash is width-exact)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        element_at(col("m"), 1).as("n"),
        element_at(col("m"), col("i") + 2).as("s_i"),
        element_at(col("m"), col("j") + 2).as("s_j"),
        element_at(col("m"), col("t") + 1).as("s_ij"))
      .withColumn("cov",
        (col("n").cast("decimal(38,0)") * col("s_ij").cast("decimal(38,0)") -
          col("s_i").cast("decimal(38,0)") * col("s_j").cast("decimal(38,0)"))
          .cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            lit((GridScale * GridScale).toDouble)))
  }

  /** Driver-side PCA from the exact covariance rows: cyclic Jacobi on the
    * KB-sized symmetric matrix (deterministic — fixed sweep order, fixed
    * iteration count bound with a convergence threshold). Returns
    * (eigenvalues desc, eigenvectors as rows, matching order).
    */
  def pcaFromCovariance(cov: Array[Array[Double]],
      sweeps: Int = 32, eps: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > eps) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** Distributed projection onto a (driver-held) basis — the second half
    * of PCA: the KB-sized eigenvector rows ride the plan as array
    * literals (a broadcast in spirit; constant-folded into codegen in
    * practice), each output coordinate is one `aggregate(zip_with(...))`
    * dot product, and the pass is narrow — no shuffle, scan speed. Use
    * the top-r rows of [[pcaFromCovariance]]'s basis for dimensionality
    * reduction ahead of ANN/clustering.
    */
  def projectOnto(vecs: DataFrame, idCol: String, vecCol: String,
      basis: Seq[Array[Double]]): DataFrame = {
    val comps = basis.zipWithIndex.map { case (row, k) =>
      aggregate(
        zip_with(col(vecCol).cast("array<double>"),
          array(row.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x).as(s"pc$k")
    }
    vecs.select(col(idCol) +: comps: _*)
      .select(col(idCol), array(basis.indices.map(k => col(s"pc$k")): _*)
        .as("projected"))
  }

  /** Gate dimensionality (the embeddings table's vector width). */
  val GateDim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_covariance" -> ((s, d) =>
      covarianceUpper(Tables.embeddings(s, d), "embedding", GateDim)
        .orderBy("i", "j")))

  val oracles: Map[String, String] = Map(
    // the oracle pays the per-row pair explosion the Aggregator avoids —
    // two independent formulations of the same exact moments
    "sim_covariance" -> s"""
      |WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,4)) * $GridScale AS BIGINT)) AS qv
      |  FROM embeddings WHERE len(embedding) = $GateDim),
      |el AS (SELECT vec_id, unnest(qv) AS x,
      |    generate_subscripts(qv, 1) - 1 AS i FROM q),
      |s1 AS (SELECT i, CAST(SUM(x) AS BIGINT) AS s FROM el GROUP BY i),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
      |sij AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS s_ij
      |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2)
      |SELECT sij.i, sij.j, n.n, sa.s AS s_i, sb.s AS s_j, sij.s_ij,
      |  CAST(CAST(CAST(n.n AS DECIMAL(38,0)) * CAST(s_ij AS DECIMAL(38,0)) -
      |    CAST(sa.s AS DECIMAL(38,0)) * CAST(sb.s AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) /
      |    (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE) * ${(GridScale * GridScale).toDouble}) AS cov
      |FROM sij, n
      |JOIN s1 sa ON sa.i = sij.i
      |JOIN s1 sb ON sb.i = sij.j
      |ORDER BY sij.i, sij.j""".stripMargin)
}
