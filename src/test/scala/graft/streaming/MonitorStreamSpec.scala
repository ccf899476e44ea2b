package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Stream ≡ batch parity for the monitor lifecycle gate: three real
  * MemoryStream triggers of `mapGroupsWithState` state + one refused
  * replay must fold to exactly the batch per-user aggregate (counts
  * integer-exact, totals on the decimal(_,4) grid → one decimal→double
  * conversion, bit-equal on both sides).
  */
class MonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  test("folded monitor snapshot equals the batch aggregate exactly; replay refused") {
    val streamed = MonitorStream.monitorStreamGate(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    val batch = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy("user_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(streamed === batch)
    // doubles compared with ==: the scaled-long state conversion must be
    // BIT-equal to Spark's decimal-sum cast, not merely close
  }
}
