package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Pipeline, PipelineSurface}

/** The corpus-prep operators are plain declarative transforms, so the
  * stateless ones run UNCHANGED on a stream: stratified sampling is a
  * narrow filter, and decontamination is a stream-static broadcast join
  * against the (small, static) eval shingle set plus a streaming count
  * aggregation. Stream result ≡ batch result on the same data.
  */
class PipelineStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample + decontamination: stream result equals batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spipe").toString + "/src"
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id".cast("long").as("doc_id"), $"text", $"lang")
    val train = docs.filter($"doc_id" % 20 =!= 0)
    val eval = docs.filter($"doc_id" % 20 === 0)
    train.write.parquet(dir)

    val stream = spark.readStream
      .schema("doc_id long, text string, lang string").parquet(dir)
    val flaggedStream = Pipeline.decontaminate(
      Pipeline.stratifiedSample(stream, "doc_id", "lang", PipelineSurface.SampleRates),
      eval, "doc_id", "text")
    // unwatermarked streaming aggregation → complete mode memory sink
    val q = flaggedStream.writeStream
      .format("memory").queryName("pipe_stream").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pipe_stream")
        .as[(Long, Long)].collect().toMap
      val batch = Pipeline.decontaminate(
        Pipeline.stratifiedSample(train, "doc_id", "lang", PipelineSurface.SampleRates),
        eval, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(batch.nonEmpty, "fixture must produce flagged docs")
      assert(streamed === batch, "stream and batch must agree exactly")
    } finally q.stop()
  }

  test("packSequences: null text flows through without corrupting later offsets") {
    val docs = Seq[(java.lang.Long, String)](
      (0L, Seq.fill(10)("t").mkString(" ")),
      (8L, null), // null text -> null token count, no window span
      (16L, Seq.fill(5)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Pipeline.packSequences(docs, "doc_id", "text",
      windowTokens = 8, shards = 8)
      .select($"doc_id", $"offset", $"n_tokens").collect()
      .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(packed(8L)._2 === null, "null text has null token count")
    // the window SUM skips nulls, so doc 16 still starts right after doc 0
    assert(packed(16L)._1 === 10L)
  }
}
