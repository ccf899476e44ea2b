package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  test("covariance aggregator ≡ driver-side moments; partition invariance") {
    val vecs = (1 to 200).map { i =>
      Tuple1(Seq.tabulate(4)(d => math.sin(i * 0.37 + d) * 0.4f.toDouble))
    }.toDF("embedding")
      .select(transform($"embedding", x => x.cast("float")).as("embedding"))
    val out = Covariance.covarianceUpper(vecs, "embedding", 4)
      .select($"i", $"j", $"n", $"s_i", $"s_j", $"s_ij")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // driver re-derivation on the same quantized grid
    val q = vecs.select($"embedding").as[Seq[Float]].collect().map(_.map(x =>
      (BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        * 10000).toLongExact))
    val n = q.length.toLong
    out.foreach { case (li, lj, gn, si, sj, sij) =>
      val (i, j) = (li.toInt, lj.toInt)
      assert(gn === n)
      assert(si === q.map(_(i)).sum)
      assert(sj === q.map(_(j)).sum)
      assert(sij === q.map(v => v(i) * v(j)).sum)
    }
    val again = Covariance.covarianceUpper(vecs.repartition(13), "embedding", 4)
      .select($"i", $"j", $"n", $"s_i", $"s_j", $"s_ij")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(again === out)
  }

  test("pcaFromCovariance: orthonormal basis, descending spectrum, reconstruction") {
    // real covariance from the gate path at sf0.001
    val rows = Covariance.covarianceUpper(
      graft.Tables.embeddings(spark, sf0001), "embedding", Covariance.GateDim)
      .select($"i", $"j", $"cov").as[(Long, Long, Double)].collect()
    val d = Covariance.GateDim
    val c = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, v) => c(i.toInt)(j.toInt) = v; c(j.toInt)(i.toInt) = v }
    val (evals, evecs) = Covariance.pcaFromCovariance(c)
    // descending spectrum, trace preserved
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(evals.sum - (0 until d).map(i => c(i)(i)).sum) < 1e-9)
    // orthonormal rows
    for (a <- 0 until d by 7; b <- 0 until d by 7) {
      val dot = (0 until d).map(k => evecs(a)(k) * evecs(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"dot($a,$b)=$dot")
    }
    // reconstruction: C ≈ Σ λ_r v_r v_rᵀ
    for (i <- 0 until d by 9; j <- 0 until d by 9) {
      val rec = (0 until d).map(r => evals(r) * evecs(r)(i) * evecs(r)(j)).sum
      assert(math.abs(rec - c(i)(j)) < 1e-9, s"recon($i,$j)")
    }
    // planted 2-d check: dominant axis of y = 2x data is (1,2)/√5
    val c2 = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    val (e2, v2) = Covariance.pcaFromCovariance(c2)
    assert(math.abs(e2(0) - 5.0) < 1e-12 && math.abs(e2(1)) < 1e-12)
    val axis = v2(0).map(math.abs)
    assert(math.abs(axis(0) - 1.0 / math.sqrt(5)) < 1e-12 &&
      math.abs(axis(1) - 2.0 / math.sqrt(5)) < 1e-12)
  }

  test("projectOnto: projected data decorrelates to the eigen spectrum") {
    val d = Covariance.GateDim
    val vecs = graft.Tables.embeddings(spark, sf0001)
    val rows = Covariance.covarianceUpper(vecs, "embedding", d)
      .select($"i", $"j", $"cov").as[(Long, Long, Double)].collect()
    val c = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, v) => c(i.toInt)(j.toInt) = v; c(j.toInt)(i.toInt) = v }
    val (evals, evecs) = Covariance.pcaFromCovariance(c)
    val r = 8
    val proj = Covariance.projectOnto(vecs, "vec_id", "embedding",
      evecs.take(r).toSeq)
      .select($"projected").as[Seq[Double]].collect()
    // narrow pass: every row has r coordinates
    assert(proj.nonEmpty && proj.forall(_.length === r))
    // driver covariance of the projected rows ≈ diag(top-r eigenvalues);
    // tolerance covers the quantized-grid covariance vs raw-double
    // projection mismatch
    val n = proj.length
    val mean = (0 until r).map(k => proj.map(_(k)).sum / n)
    for (a <- 0 until r; b <- a until r) {
      val cv = proj.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / n
      val want = if (a == b) evals(a) else 0.0
      assert(math.abs(cv - want) < 1e-4, s"pcov($a,$b)=$cv want $want")
    }
    // spectrum actually concentrates: top component carries the most
    assert(evals(0) > evals(r - 1))
  }
}
