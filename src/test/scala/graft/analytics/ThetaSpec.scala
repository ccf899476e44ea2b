package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  test("theta intersection: exact mode below k, bounded sketch, planted-overlap accuracy") {
    // planted universe: A = [0, 5000), B = [3000, 8000) → |A∩B| = 2000
    val a = (0L until 5000L).map(i => ("A", s"u$i"))
    val b = (3000L until 8000L).map(i => ("B", s"u$i"))
    // C tiny (exact mode): C ⊂ A with 40 elements
    val c = (100L until 140L).map(i => ("C", s"u$i"))
    val df = (a ++ b ++ c).toDF("s", "e")

    val sk = Theta.sketch(df, "s", "e")
    val sizes = sk.groupBy($"set_id").count().as[(String, Long)].collect().toMap
    assert(sizes("A") === Theta.K && sizes("B") === Theta.K && sizes("C") === 40L)

    val out = Theta.pairIntersections(df, "s", "e")
      .select($"set_a", $"set_b", $"theta", $"n_matches", $"est_intersect",
        $"exact_intersect", $"err_bound_ok")
      .as[(String, String, Option[Long], Long, Double, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    // A∩B estimating mode: within the 3σ band around 2000, flag green
    val ab = out(("A", "B"))
    assert(ab._6 === 2000L && ab._7, s"A∩B: $ab")
    assert(math.abs(ab._5 - 2000.0) <= 3.0 * 2000.0 / math.sqrt(ab._4.toDouble))
    // A∩C: C is exact-mode but A is not → still an estimate with θ = θA
    val ac = out(("A", "C"))
    assert(ac._6 === 40L && ac._7)
    // pairs come out deterministically on any layout
    val again = Theta.pairIntersections(df.repartition(13), "s", "e")
      .select($"set_a", $"set_b", $"n_matches", $"est_intersect")
      .as[(String, String, Long, Double)].collect().toSet
    assert(again === out.values.map(r => (r._1, r._2, r._4, r._5)).toSet)
  }

  test("theta exact mode: both sets under k → theta null, estimate equals exact") {
    val df = ((0 until 50).map(i => ("X", s"v$i")) ++
      (25 until 80).map(i => ("Y", s"v$i"))).toDF("s", "e")
    val r = Theta.pairIntersections(df, "s", "e")
      .select($"theta", $"n_matches", $"est_intersect", $"exact_intersect")
      .as[(Option[Long], Long, Double, Long)].head()
    assert(r._1.isEmpty && r._2 === 25L && r._3 === 25.0 && r._4 === 25L)
  }
}
