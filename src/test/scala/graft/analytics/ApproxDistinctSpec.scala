package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `q_approx_distinct_parts` gate is hash-checked via its
  * `err_bound_ok` column (HLL sketch values are engine-specific, so the
  * gate compares the estimate to the exact count inside Spark and the
  * oracle emits literal TRUE); this spec asserts the same bound directly
  * plus the gate's output shape.
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

  test("gate output carries the bound as a column, true on every group") {
    val out = Relational.approxDistinctParts(spark, sf0001)
    assert(out.columns.toSeq ===
      Seq("l_returnflag", "exact_parts", "n", "err_bound_ok"))
    assert(out.filter(!$"err_bound_ok").isEmpty)
  }

  test("percentile_approx estimates land within the GK rank-error bound") {
    val out = Relational.approxQuantilesPrice(spark, sf0001)
    assert(out.columns.toSeq ===
      Seq("l_returnflag", "n", "median_bound_ok", "p90_bound_ok"))
    val rows = out.as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.length === 3)
    assert(rows.forall(r => r._3 && r._4), s"bound violated: ${rows.mkString(",")}")
    // the bound is genuinely checked: the true rank of each estimate was
    // recounted against the data, not assumed — cross-check the median rank
    // by hand on one group
    val li = graft.Tables.lineitem(spark, sf0001)
      .filter($"l_returnflag" === "A").select($"l_extendedprice")
    val vals = li.as[Double].collect().sorted
    val est = li.agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)))
      .as[Double].head()
    val rank = vals.count(_ <= est)
    assert(math.abs(rank - vals.length * 0.5) <= vals.length / 10000.0 + 1.0)
  }
}
