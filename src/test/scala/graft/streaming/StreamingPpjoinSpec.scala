package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.dedup.{Dedup, DedupSurface}
import graft.store.VersionedTable

/** Stream ≡ batch parity for the incremental exact-Jaccard join: docs
  * arriving over multiple micro-batches against a persisted prefix index
  * must yield EXACTLY the pair set (ids AND jaccard values) of the batch
  * operator over all docs at once — including pairs BETWEEN docs of
  * different micro-batches, which only exist if the index extension grows
  * correctly trigger-over-trigger.
  */
class StreamingPpjoinSpec extends SparkSpec {
  import spark.implicits._

  private val tau = DedupSurface.PpjoinTau

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet

  test("streaming ppjoin over micro-batches equals the one-shot batch join EXACTLY") {
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val index = Dedup.prefixIndex(docs, "doc_id", "text", tau)
    val inc = DedupSurface.incBatch(spark, sf0001)
      .select($"doc_id", $"text")

    // split the increment into 3 files -> 3 micro-batches (1 file/trigger);
    // the +500000 batch-internal exact dups of the +400000 fresh docs land
    // in DIFFERENT batches (doc_id mod 3 split), so cross-micro-batch
    // pairing is genuinely exercised
    val srcDir = Files.createTempDirectory("graft-sppj-src").toString + "/src"
    (0 until 3).foreach { i =>
      inc.filter($"doc_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val root = Files.createTempDirectory("graft-sppj-tbl").toString
    val ckpt = Files.createTempDirectory("graft-sppj-ck").toString
    val stream = spark.readStream.schema("doc_id long, text string")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val q = StreamingPpjoin.start(stream, index, "doc_id", "text", tau,
      root, ckpt)
    try q.processAllAvailable() finally q.stop()

    val streamed = pairSet(StreamingPpjoin.pairs(spark, root))
    val oneShot = pairSet(
      Dedup.ppjoinAgainst(index, inc, "doc_id", "text", tau))
    assert(oneShot.nonEmpty, "parity test needs a non-empty pair set")
    // cross-micro-batch pairs must exist for the test to mean anything:
    // at least one pair where neither doc is in the corpus index
    val corpusIds = docs.select($"doc_id").as[Long].collect().toSet
    assert(oneShot.exists(p => !corpusIds(p._1) && !corpusIds(p._2)),
      "expected batch-internal (stream-only) pairs in the increment")
    assert(streamed === oneShot)

    // exactly-once: replaying an already-committed micro-batch (the
    // foreachBatch crash-replay) changes nothing — the idempotence tags
    // refuse all three appends
    val vBefore = VersionedTable.latestVersion(spark, s"$root/pairs")
    StreamingPpjoin.processBatch(index,
      inc.filter($"doc_id" % 3 === 0), "doc_id", "text", tau, root, 0L)
    assert(VersionedTable.latestVersion(spark, s"$root/pairs") === vBefore)
    assert(pairSet(StreamingPpjoin.pairs(spark, root)) === oneShot)
  }
}
