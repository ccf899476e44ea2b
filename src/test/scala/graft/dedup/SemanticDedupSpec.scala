package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(vs: Seq[(Long, Array[Double])]) =
    vs.toDF("vec_id", "v")

  // deterministic pseudo-random unit-ish vectors
  private def vec(seed: Long, d: Int = 8): Array[Double] =
    Array.tabulate(d)(i => math.sin(seed * 31 + i * 7).abs + 0.1)

  test("scaled duplicates are dropped, the lowest id per group is kept") {
    val base = (0L until 40L).map(i => (i, vec(i)))
    // plant exact-scale dups of vectors 3 and 7 with higher ids
    val dups = Seq((103L, vec(3).map(_ * 1.001)), (107L, vec(7).map(_ * 2.0)))
    val out = SemanticDedup.semanticDedup(vecDf(base ++ dups), "vec_id", "v",
      k = 4, iters = 1, threshold = 0.9999)
      .as[(Long, Long, Boolean)].collect()
    val kept = out.filter(_._3).map(_._1).toSet
    assert(out.length === 42)
    assert(!kept.contains(103L) && !kept.contains(107L),
      "scaled dups must be pruned")
    assert(kept.contains(3L) && kept.contains(7L),
      "the lowest-id member of each dup group must survive")
  }

  test("pruning matches the exists-lower-id brute force within clusters") {
    val vs = (0L until 60L).map(i => (i, vec(i % 20))) // heavy duplication
    val thr = 0.9999
    val out = SemanticDedup.semanticDedup(vecDf(vs), "vec_id", "v",
      k = 5, iters = 2, threshold = thr)
      .as[(Long, Long, Boolean)].collect()
    val cidOf = out.map(r => r._1 -> r._2).toMap
    val byId = vs.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { case (id, cid, kept) =>
      val expectDrop = vs.exists { case (o, ov) =>
        o < id && cidOf(o) == cid && cos(ov, byId(id)) >= thr
      }
      assert(kept === !expectDrop, s"vec $id kept=$kept expectDrop=$expectDrop")
    }
  }

  test("vectors in different clusters never prune each other") {
    // two tight orthogonal-ish groups; k=2 separates them, and identical
    // vectors across groups can't exist, so everything within-cluster
    // distinct survives a high threshold
    val g1 = (0L until 10L).map(i => (i, Array(1.0, 0.0, i.toDouble / 100 + 0.01)))
    val g2 = (20L until 30L).map(i => (i, Array(0.0, 1.0, i.toDouble / 100 + 0.01)))
    val out = SemanticDedup.semanticDedup(vecDf(g1 ++ g2), "vec_id", "v",
      k = 2, iters = 2, threshold = 0.99999)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._3), "no cross-cluster or sub-threshold pruning")
  }
}
