package graft.exec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamLogRouterSpec extends SparkSpec {
  import spark.implicits._

  test("streaming router fans one batch out to filed + inline sinks (X8 streaming)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-logsrc").toString + "/src"
    Seq(
      ("t1", "small payload"),
      ("t2", "PyAnamo:\tkeep\n" + ("x" * 3000)),
      ("t3", "y" * 5000))
      .toDF("task", "payload").write.parquet(srcDir)
    val filed = java.nio.file.Files.createTempDirectory("graft-filed").toString
    val inline = java.nio.file.Files.createTempDirectory("graft-inline").toString
    val stream = spark.readStream
      .schema("task string, payload string").parquet(srcDir)
    val q = LogRouter.streamSink(stream, "payload", filed, inline)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()

    val inlined = spark.read.parquet(inline)
    assert(inlined.select($"task").as[String].collect().toSet === Set("t1", "t2"))
    assert(inlined.filter($"task" === "t2").select($"route").as[String].head()
      === "dynamo_salvaged")
    val cloudwatch = spark.read.text(s"$filed/route=cloudwatch")
    assert(cloudwatch.count() === 1)
    // gzip codec actually applied to the filed tier (files live in the
    // batch-owned partition dirs)
    val gz = new java.io.File(s"$filed/route=cloudwatch").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".txt.gz"))
    assert(gz.nonEmpty)

    // at-least-once replay is idempotent: a second stream over the same
    // source with a FRESH checkpoint re-delivers everything as batch 0 —
    // the batch-owned dynamic-overwrite partitions replace, never append
    // (snapshot the counts first: the overwrite invalidates old listings)
    val inlineBefore = inlined.count()
    val q2 = LogRouter.streamSink(stream, "payload", filed, inline)
      .trigger(Trigger.AvailableNow()).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(inline).count() === inlineBefore)
    assert(spark.read.text(s"$filed/route=cloudwatch").count() === 1)
  }
}
