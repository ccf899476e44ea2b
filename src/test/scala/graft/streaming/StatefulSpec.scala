package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState running totals match the batch aggregation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evDir = java.nio.file.Files.createTempDirectory("graft-sf-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      evDir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema("event_id long, ts long, user_id long, event_type string, value double, props string")
      .parquet(evDir.toString)
      .select($"user_id", $"event_type", $"value")
      .as[Stateful.UserEvent]
    val q = Stateful.runningUserTotals(stream)
      .writeStream.outputMode(Stateful.outputMode)
      .format("memory").queryName("user_totals")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.processAllAvailable()
      // last update per user = final running totals = batch aggregation
      val streamed = spark.table("user_totals")
        .groupBy($"user_id")
        .agg(max($"n").as("n"), max($"total").as("total"))
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, t) => u -> ((n, math.round(t * 100))) }.toMap
      val batch = graft.Tables.events(spark, sf0001)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).cast("double").as("total"))
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, t) => u -> ((n, math.round(t * 100))) }.toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
