package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rows-only gate (`q_approx_distinct_parts`) has no value oracle by
  * design (HLL sketches are engine-specific); this spec supplies the
  * missing correctness bound: the estimate must sit within HLL's
  * advertised error of the exact distinct count, per group.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within the HLL error bound of the exact count") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val both = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .as[(String, Long, Long)].collect()
    assert(both.length === 3)
    both.foreach { case (flag, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      // default rsd = 0.05; 3 sigma headroom (estimates are deterministic
      // for fixed data, this guards regressions in how the gate is wired)
      assert(rel <= 0.15, s"$flag: approx $approx vs exact $exact (rel $rel)")
    }
  }
}
