package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LogRouterSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    ("tiny", "x" * 10),
    ("at_1999", "x" * 1999),
    ("at_2000", "x" * 2000),
    ("big_tagged", "PyAnamo:\tkeep me\n" + ("x" * 3000)),
    ("big_tagged_huge_salvage", "PyAnamo:\t" + ("y" * 2500) + "\n" + ("x" * 3000)),
    ("over_10mb", "x" * (10 * 1024 * 1024 + 1)),
  ).toDF("name", "payload")

  test("tier thresholds at 1999/2000/10MB boundaries (executor.py:179-212)") {
    val routed = LogRouter.route(payloads, "payload")
      .select($"name", $"route").as[(String, String)].collect().toMap
    assert(routed("tiny") === "dynamo")
    assert(routed("at_1999") === "dynamo") // < 2000 inline
    assert(routed("at_2000") === "cloudwatch") // >= 2000 off-table
    assert(routed("big_tagged") === "dynamo_salvaged") // tagged lines fit inline
    assert(routed("big_tagged_huge_salvage") === "cloudwatch") // salvage too big
    assert(routed("over_10mb") === "s3")
  }

  test("salvage keeps only tagged lines with the tag stripped (executor.py:102-113)") {
    val s = LogRouter.route(payloads, "payload")
      .filter($"name" === "big_tagged").select($"salvaged").as[String].head()
    assert(s === "keep me")
  }

  test("untagged payload salvages to null") {
    val s = LogRouter.route(payloads, "payload")
      .filter($"name" === "tiny").select($"salvaged").isEmpty
    assert(LogRouter.route(payloads, "payload")
      .filter($"name" === "tiny" && $"salvaged".isNull).count() === 1)
  }

  test("sink splits inline vs filed tiers and writes gzip text") {
    val out = java.nio.file.Files.createTempDirectory("graft-logs").toString
    val inline = LogRouter.sink(LogRouter.route(payloads, "payload"), "payload", out)
    assert(inline.select($"name").as[String].collect().toSet ===
      Set("tiny", "at_1999", "big_tagged"))
    val written = spark.read.text(s"$out/route=cloudwatch").count()
    assert(written >= 1)
  }
}
