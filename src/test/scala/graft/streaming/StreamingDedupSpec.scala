package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup keeps one row per fingerprint within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString + "/src"
    // 3 distinct texts; "dup me" arrives three times at different ts
    Seq(
      (1L, "2024-01-01 00:00:01", "dup me"),
      (2L, "2024-01-01 00:00:02", "unique one"),
      (3L, "2024-01-01 00:00:03", "dup  me"), // normalizes to the same fp
      (4L, "2024-01-01 00:00:04", "another text"),
      (5L, "2024-01-01 00:00:05", "DUP ME"))
      .toDF("id", "ts", "text")
      .withColumn("ts", to_timestamp($"ts"))
      .write.parquet(dir)
    val stream = spark.readStream
      .schema("id long, ts timestamp, text string").parquet(dir)
    val q = Monitors.runToMemory(
      Monitors.streamingExactDedup(stream, "ts", "text"),
      "dedup_out", "append")
    try {
      val kept = spark.table("dedup_out")
        .select($"id").as[Long].collect().toSet
      // one survivor per fingerprint: {dup me (either arrival), unique, another}
      assert(kept.size === 3)
      assert(kept.contains(2L) && kept.contains(4L))
      assert((kept - 2L - 4L).subsetOf(Set(1L, 3L, 5L)))
    } finally q.stop()
  }
}
