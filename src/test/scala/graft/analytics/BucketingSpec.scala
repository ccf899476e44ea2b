package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = the co-located-join strategy for repeated big-big joins at
  * scale (SURVEY §4 / prompt "bucketing for co-located joins"): both fact
  * tables bucketed by the join key join with NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    Layout.writeBucketed(
      graft.Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_quantity"),
      "li_bucketed", s"$tmp/li", 8, Seq("l_orderkey"))
    Layout.writeBucketed(
      graft.Tables.orders(spark, sf0001).select($"o_orderkey", $"o_orderpriority"),
      "ord_bucketed", s"$tmp/ord", 8, Seq("o_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the sort-merge path so the bucket co-location is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      assert(joined.count() === 6000)
      // the bare join: inputs come straight from the bucketed scans — the
      // whole plan must contain NO shuffle exchange at all
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(plan.contains("Bucketed: true"), plan.take(600))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
      // and the aggregation on top is still correct
      val rows = joined.groupBy($"o_orderpriority").agg(sum($"l_quantity").as("q")).collect()
      assert(rows.length === 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
