package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.analytics.Profile
import graft.store.VersionedTable

/** Streaming/incremental data-quality profile — the monitor a pipeline
  * keeps over an arriving corpus: per-column row/null counts, min/max,
  * and HLL-register distinct sketches, maintained micro-batch by
  * micro-batch so the CURRENT profile is always one cheap read away and
  * the full corpus is never re-scanned.
  *
  * Mechanics: each micro-batch computes its own [[Profile.sketchParts]]
  * (per-slice stats + register table) and APPENDS both to
  * [[VersionedTable]]s under the `batch-<id>` idempotence tag —
  * append-only logs of mergeable parts. [[snapshot]] folds the logs:
  * stats by sum/sum/min/max (with the numeric-vs-lexicographic kind the
  * parts carry), registers by per-(pos, bucket) MAX — every fold is
  * order-free and idempotent, so the snapshot equals
  * [[Profile.profileSketch]] over all data seen so far EXACTLY
  * (`StreamingProfileSpec` asserts it), and a replayed micro-batch
  * (refused by the tag) can never skew a count.
  *
  * 100 TB shape: per trigger the work is one batch-sized stats pass plus
  * a register aggregate that partial-collapses to ≤ 2^p rows per column
  * per partition; the persisted logs grow by O(columns) + O(columns×2^p)
  * rows per trigger regardless of batch size, and [[VersionedTable
  * .optimize]] compacts them on the usual cadence.
  */
object StreamingProfile {

  private def statsRoot(root: String) = s"$root/stats"
  private def regsRoot(root: String) = s"$root/registers"

  private def ensure(spark: SparkSession, tableRoot: String,
      like: DataFrame): Unit =
    if (VersionedTable.latestVersion(spark, tableRoot).isEmpty)
      VersionedTable.create(spark, tableRoot, like.filter(lit(false)))

  /** One micro-batch: append the batch's mergeable parts. Public so the
    * parity spec can drive (and replay) batches directly.
    */
  def processBatch(batch: DataFrame, root: String, batchId: Long,
      quantScale: Int = 2): Unit = {
    val spark = batch.sparkSession
    val tag = s"batch-$batchId"
    // replay short-circuit BEFORE computing the batch's parts:
    // sketchParts pays a full batch scan eagerly (the stats agg), and a
    // replayed trigger would burn it only for appendBatch to refuse the
    // tag — check the cheap manifest first (appendBatch re-checks under
    // the CAS, so this is an optimization, not the correctness guard)
    val alreadyApplied =
      VersionedTable.latestVersion(spark, statsRoot(root)).isDefined &&
        VersionedTable.snapshot(spark, statsRoot(root)).tags.contains(tag) &&
        VersionedTable.latestVersion(spark, regsRoot(root)).isDefined &&
        VersionedTable.snapshot(spark, regsRoot(root)).tags.contains(tag)
    if (alreadyApplied) return
    val (stats, regs0) = Profile.sketchParts(batch, quantScale)
    // a trigger's register part is bounded at columns × 2^p rows at ANY
    // batch size — one output file per commit, not shuffle-partition-many
    // tiny ones (each extra file is a footer-stat read on every append
    // and a manifest entry forever). repartition, not coalesce: coalesce
    // would collapse the whole melt+HLL stage into one task; the extra
    // exchange moves only the ≤ cols × 2^p result rows
    val regs = regs0.repartition(1)
    ensure(spark, statsRoot(root), stats)
    ensure(spark, regsRoot(root), regs)
    VersionedTable.appendBatch(spark, statsRoot(root), stats, tag)
    VersionedTable.appendBatch(spark, regsRoot(root), regs, tag)
  }

  /** The current profile over everything ingested so far —
    * [[Profile.profileSketch]]-shaped, computed from the part logs
    * without touching the original data.
    */
  def snapshot(spark: SparkSession, root: String): DataFrame =
    Profile.assembleSketch(
      VersionedTable.read(spark, statsRoot(root)),
      VersionedTable.read(spark, regsRoot(root)))

  def start(stream: DataFrame, root: String, checkpoint: String,
      quantScale: Int = 2): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, root, batchId, quantScale)
      }
      .start()
}
