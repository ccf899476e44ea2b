package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.dedup.{Dedup, DedupSurface}
import graft.store.VersionedTable

/** Stream ≡ batch parity for incremental exact substring dedup: docs over
  * multiple micro-batches against a persisted gram index must yield
  * EXACTLY the batch operator's pairs (ids AND n_shared), including
  * cross-micro-batch pairs — which only exist if the gram index grows
  * correctly trigger-over-trigger.
  */
class StreamingSubstringSpec extends SparkSpec {
  import spark.implicits._

  private val l = DedupSurface.SubstringL

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)]
      .collect().toSet

  test("streaming substring dedup over micro-batches equals the one-shot batch join EXACTLY") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val index = Dedup.substringIndex(docs, "doc_id", "text", l)
    val inc = DedupSurface.incBatch(spark, sf0001).select($"doc_id", $"text")

    val srcDir = Files.createTempDirectory("graft-sss-src").toString + "/src"
    (0 until 3).foreach { i =>
      inc.filter($"doc_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val root = Files.createTempDirectory("graft-sss-tbl").toString
    val ckpt = Files.createTempDirectory("graft-sss-ck").toString
    val stream = spark.readStream.schema("doc_id long, text string")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val q = StreamingSubstring.start(stream, index, "doc_id", "text", l,
      root, ckpt)
    try q.processAllAvailable() finally q.stop()

    val streamed = pairSet(StreamingSubstring.pairs(spark, root))
    val oneShot = pairSet(
      Dedup.substringAgainst(index, inc, "doc_id", "text", l))
    assert(oneShot.nonEmpty, "parity test needs a non-empty pair set")
    // cross-micro-batch (stream-only) pairs must exist for the test to
    // mean anything: the +500000 exact dups of the +400000 fresh docs land
    // in different doc_id%3 batches for ids where the offsets differ mod 3
    val corpusIds = docs.select($"doc_id").as[Long].collect().toSet
    assert(oneShot.exists(p => !corpusIds(p._1) && !corpusIds(p._2)),
      "expected stream-only pairs in the increment")
    assert(streamed === oneShot)

    // the incremental operator also agrees with the one-shot SELF-join
    // over corpus ∪ stream, restricted to pairs touching a stream doc
    val full = pairSet(
      Dedup.substringPairs(docs.unionByName(inc), "doc_id", "text", l))
      .filter(p => !corpusIds(p._1) || !corpusIds(p._2))
    assert(streamed === full)

    // exactly-once: replaying a committed micro-batch changes nothing
    val vBefore = VersionedTable.latestVersion(spark, s"$root/pairs")
    StreamingSubstring.processBatch(index,
      inc.filter($"doc_id" % 3 === 0), "doc_id", "text", l, root, 0L)
    assert(VersionedTable.latestVersion(spark, s"$root/pairs") === vBefore)
    assert(pairSet(StreamingSubstring.pairs(spark, root)) === oneShot)
  }
}
