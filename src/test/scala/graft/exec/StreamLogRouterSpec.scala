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
    // gzip codec actually applied to the filed tier
    val gz = new java.io.File(s"$filed/route=cloudwatch").listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(gz.nonEmpty)
  }
}
