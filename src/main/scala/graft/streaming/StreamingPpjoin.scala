package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup
import graft.dedup.Dedup.PrefixIndex
import graft.store.VersionedTable

/** Streaming twin of the incremental EXACT Jaccard join
  * ([[Dedup.ppjoinAgainst]]): micro-batches of new documents join against a
  * persisted, GROWING prefix index — corpus plus every previously-ingested
  * stream doc — so the accumulated pair set is EXACTLY what the batch
  * operator returns over all stream docs at once (the parity
  * `StreamingPpjoinSpec` asserts set-equality including jaccard values).
  *
  * Exactness across micro-batches: every doc's prefix is ranked by the
  * ORIGINAL index's (df, gram) order with unseen grams at df 0
  * ([[Dedup.ppjoinBatchSide]]); the index freq is never updated, so corpus
  * docs and all micro-batches share one global gram order and the
  * prefix-filter + positional-filter lemmas hold for every cross pair —
  * batch×corpus, batch×earlier-batch, and batch-internal alike.
  *
  * Exactly-once: four [[VersionedTable]]s (emitted pairs, extension
  * prefix rows, extension gram sets, extension member rows) each commit
  * the micro-batch under the idempotence tag `batch-<id>`
  * ([[VersionedTable.appendBatch]] refuses a replayed tag atomically under
  * the manifest CAS). A crash between the commits is safe: the pair
  * computation only ever READS extension state from BEFORE this batch's
  * appends, and a partially-applied extension contributes no pairs —
  * candidates need a family's prefix row, verification its gram set,
  * expansion its member rows, and the inner joins drop incomplete
  * families — so a replay recomputes bit-identical pairs and each append
  * lands exactly once (Structured Streaming replays batch N to completion
  * before starting N+1, so no later batch ever pairs against a torn
  * extension).
  *
  * 100 TB shape: per trigger, work is (batch prefix build) + equi-joins of
  * the batch's prefix grams against the persisted index — the corpus is
  * never re-paired and never rescanned beyond the gram-key join, the same
  * daily-batch scaling argument as [[Dedup.ppjoinAgainst]] (SCALE_PROBE
  * measures it at 10×). The extension tables are columnar parquet behind
  * the manifest, so every trigger's scan is pruned and codegen-friendly.
  */
object StreamingPpjoin {

  private def pairsRoot(root: String) = s"$root/pairs"
  private def prefixRoot(root: String) = s"$root/ext_prefix"
  private def gramsRoot(root: String) = s"$root/ext_grams"
  private def membersRoot(root: String) = s"$root/ext_members"

  private def ensure(spark: SparkSession, tableRoot: String,
      like: DataFrame): Unit =
    if (VersionedTable.latestVersion(spark, tableRoot).isEmpty)
      VersionedTable.create(spark, tableRoot, like.filter(lit(false)))

  /** One micro-batch: pair `batch` against index ⊕ extension-so-far, then
    * fold the batch into the extension. Public so the parity spec can
    * drive (and replay) batches directly.
    */
  def processBatch(index: PrefixIndex, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, root: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val tag = s"batch-$batchId"
    val (bg, bprefix, bmembers) =
      Dedup.ppjoinBatchSide(index, batch, idCol, textCol, threshold)
    ensure(spark, prefixRoot(root), bprefix)
    ensure(spark, gramsRoot(root), bg)
    ensure(spark, membersRoot(root), bmembers)
    val extPrefix = VersionedTable.read(spark, prefixRoot(root))
    val extGrams = VersionedTable.read(spark, gramsRoot(root))
    val extMembers = VersionedTable.read(spark, membersRoot(root))
    val effective = PrefixIndex(index.freq,
      index.prefix.unionByName(extPrefix),
      index.grams.unionByName(extGrams),
      index.members.unionByName(extMembers))
    val pairs =
      Dedup.ppjoinAgainst(effective, batch, idCol, textCol, threshold)
    ensure(spark, pairsRoot(root), pairs)
    VersionedTable.appendBatch(spark, pairsRoot(root), pairs, tag)
    VersionedTable.appendBatch(spark, prefixRoot(root), bprefix, tag)
    VersionedTable.appendBatch(spark, gramsRoot(root), bg, tag)
    VersionedTable.appendBatch(spark, membersRoot(root), bmembers, tag)
  }

  /** Accumulated exact-Jaccard pairs emitted so far. */
  def pairs(spark: SparkSession, root: String): DataFrame =
    VersionedTable.read(spark, pairsRoot(root))

  def start(stream: DataFrame, index: PrefixIndex, idCol: String,
      textCol: String, threshold: Double, root: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(index, batch, idCol, textCol, threshold, root, batchId)
      }
      .start()
}
