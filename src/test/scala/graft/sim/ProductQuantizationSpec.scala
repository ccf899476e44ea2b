package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 64
  private val M = 4
  private val Ksub = 8

  private lazy val vecs = graft.Tables.embeddings(spark, sf0001)
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    .cache()

  test("codebooks: m*ksub dense-coded centroids of subspace width") {
    val cb = ProductQuantization.trainCodebooks(
      vecs, "vec_id", "v", Dims, M, Ksub, iters = 2).cache()
    assert(cb.count() === M * Ksub)
    // intentionally-Int decoder: the codebook's subspace index is Int in
    // its internal schema — not a gate output
    val bySub = cb.groupBy("sub").agg(
      count(lit(1)).as("n"), min("code").as("lo"), max("code").as("hi"))
      .as[(Int, Long, Long, Long)].collect()
    assert(bySub.length === M)
    bySub.foreach { case (_, n, lo, hi) =>
      assert(n === Ksub && lo === 0L && hi === (Ksub - 1).toLong)
    }
    assert(cb.select(size($"cv")).distinct().as[Int].collect().toSeq ===
      Seq(Dims / M))
  }

  test("encode emits one in-range code per subspace") {
    val cb = ProductQuantization.trainCodebooks(
      vecs, "vec_id", "v", Dims, M, Ksub, iters = 1)
    val enc = ProductQuantization.encode(vecs, "vec_id", "v", cb, Dims, M)
      .cache()
    assert(enc.count() === vecs.count())
    assert(enc.select(size($"codes")).distinct().as[Int].collect().toSeq ===
      Seq(M))
    val (lo, hi) = enc.select(explode($"codes").as("c"))
      .agg(min("c"), max("c")).as[(Long, Long)].head()
    assert(lo >= 0L && hi < Ksub.toLong, s"codes out of range [$lo, $hi]")
  }

  test("IVFADC: one list per vector, no duplicate pairs, duplicate at min ADC") {
    val queries = vecs.filter($"vec_id" < 20).cache()
    val copies = queries.select(($"vec_id" + 100000L).as("vec_id"), $"v")
    val corpus = vecs.unionByName(copies).cache()
    val coarse = Similarity.trainCentroids(corpus, "vec_id", "v", 8, iters = 2)
    val resid = ProductQuantization.residuals(corpus, coarse, "vec_id", "v")
    // every corpus vector lands in exactly one list
    assert(resid.count() === corpus.count())
    val cb = ProductQuantization.trainCodebooks(
      resid, "id", "rv", Dims, M, Ksub, iters = 2)
    val top = ProductQuantization.ivfPqTopK(
      queries, corpus, coarse, cb, "vec_id", "v", Dims, M, k = 50, nprobe = 2)
      .select($"query_id", $"neighbor_id", $"adist")
      .as[(Long, Long, Long)].collect()
    assert(top.length === top.distinct.length, "duplicate (query, neighbor)")
    // an exact copy shares the query's home list and residual, so its codes
    // are the query's own per-subspace argmins — the global ADC minimum
    top.groupBy(_._1).foreach { case (q, rows) =>
      val copy = rows.find(_._2 === q + 100000L)
      assert(copy.isDefined, s"planted duplicate of $q missing from top-50")
      assert(copy.get._3 === rows.map(_._3).min,
        s"duplicate of $q not at the minimum ADC distance")
    }
  }

  test("ADC: an exact duplicate attains the minimum asymmetric distance") {
    // an exact copy gets the query's own codes, and encoding picks the
    // per-subspace argmin — so its ADC distance is the global minimum
    val queries = vecs.filter($"vec_id" < 20).cache()
    val copies = queries.select(($"vec_id" + 100000L).as("vec_id"), $"v")
    val corpus = vecs.unionByName(copies).cache()
    val cb = ProductQuantization.trainCodebooks(
      corpus, "vec_id", "v", Dims, M, Ksub, iters = 2)
    val top = ProductQuantization.topK(
      queries, corpus, cb, "vec_id", "v", Dims, M, k = 50)
      .select($"query_id", $"neighbor_id", $"rank", $"adist")
      .as[(Long, Long, Long, Long)].collect()
    val byQuery = top.groupBy(_._1)
    (0L until 20L).foreach { q =>
      val rows = byQuery(q)
      val minD = rows.map(_._4).min
      val copy = rows.find(_._2 === q + 100000L)
      assert(copy.isDefined, s"planted duplicate of $q missing from top-50")
      assert(copy.get._4 === minD,
        s"duplicate of $q at adist ${copy.get._4}, min is $minD")
    }
  }
}
