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
  * (per-slice stats + register table) and appends BOTH parts as ONE
  * [[VersionedTable]] commit under the `batch-<id>` idempotence tag — a
  * single append-only log of mergeable part rows discriminated by a
  * `part` column ("stats" / "regs"). One commit per trigger, not two:
  * the commit (write job + footer-stat harvest + manifest CAS) is the
  * per-trigger fixed cost, and a two-table layout paid it twice while
  * also leaving a torn window where stats had committed but registers
  * had not. The stats aggregate and the register melt run as two scan
  * branches of that one commit job (uncached on purpose — see
  * [[processBatch]]). [[snapshot]] folds the
  * log: stats by sum/sum/min/max (with the numeric-vs-lexicographic kind
  * the parts carry), registers by per-(pos, bucket) MAX — every fold is
  * order-free and idempotent, so the snapshot equals
  * [[Profile.profileSketch]] over all data seen so far EXACTLY
  * (`StreamingProfileSpec` asserts it), and a replayed micro-batch
  * (refused by the tag) can never skew a count.
  *
  * 100 TB shape: per trigger the work is one batch-sized cached scan
  * feeding a stats aggregate plus a register aggregate that
  * partial-collapses to ≤ 2^p rows per column per partition; the
  * persisted log grows by O(columns) + O(columns×2^p) rows per trigger
  * regardless of batch size, and [[VersionedTable.optimize]] compacts it
  * on the usual cadence.
  */
object StreamingProfile {

  private def partsRoot(root: String) = s"$root/parts"

  private def ensure(spark: SparkSession, tableRoot: String,
      like: DataFrame): Unit =
    if (VersionedTable.latestVersion(spark, tableRoot).isEmpty)
      VersionedTable.create(spark, tableRoot, like.filter(lit(false)))

  /** Both sketch parts as one unified-row table: stats rows carry the
    * per-column aggregate fields, register rows carry (bucket, rank);
    * the `part` discriminator keeps the fold exact on read-back.
    */
  private def unifiedParts(stats: DataFrame, regs: DataFrame): DataFrame =
    stats.select(lit("stats").as("part"), col("pos"), col("column"),
        col("kind"), col("n_rows"), col("n_nulls"),
        col("min_value"), col("max_value"),
        lit(null).cast("int").as("bucket"), lit(null).cast("int").as("rank"))
      .unionByName(regs.select(lit("regs").as("part"), col("pos"),
        lit(null).cast("string").as("column"),
        lit(null).cast("string").as("kind"),
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("long").as("n_nulls"),
        lit(null).cast("string").as("min_value"),
        lit(null).cast("string").as("max_value"),
        col("bucket"), col("rank")))

  /** One micro-batch: append the batch's mergeable parts in one commit.
    * Public so the parity spec can drive (and replay) batches directly.
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
      VersionedTable.latestVersion(spark, partsRoot(root)).isDefined &&
        VersionedTable.snapshot(spark, partsRoot(root)).tags.contains(tag)
    if (alreadyApplied) return
    // the stats aggregate and the register melt are two scan branches of
    // ONE commit job. Deliberately NOT cached: for a file-stream batch the
    // second scan re-reads a micro-batch-sized parquet slice, which
    // measures ~3× cheaper than materializing the batch into block
    // storage first (the r14 maxFilesPerTrigger sweep: cache cost ~0.5 s
    // per trigger vs ~0.15 s for the extra columnar scan at sf0.1) — and
    // the cached form holds the batch in executor memory for the whole
    // trigger, a budget that scales with batch size while the uncached
    // form's memory is bounded by the aggregation buffers alone
    val (stats, regs) = Profile.sketchParts(batch, quantScale)
    // a trigger's combined part is bounded at O(cols × 2^p) rows at ANY
    // batch size — one output file per commit, not
    // shuffle-partition-many tiny ones (each extra file is a footer-stat
    // read on every append and a manifest entry forever). repartition,
    // not coalesce: coalesce would collapse the whole melt+HLL stage
    // into one task; the extra exchange moves only the result rows
    val unified = unifiedParts(stats, regs).repartition(1)
    ensure(spark, partsRoot(root), unified)
    VersionedTable.appendBatch(spark, partsRoot(root), unified, tag)
    ()
  }

  /** The current profile over everything ingested so far —
    * [[Profile.profileSketch]]-shaped, computed from the part log
    * without touching the original data.
    */
  def snapshot(spark: SparkSession, root: String): DataFrame = {
    val parts = VersionedTable.read(spark, partsRoot(root))
    Profile.assembleSketch(
      parts.filter(col("part") === "stats")
        .select("pos", "column", "kind", "n_rows", "n_nulls",
          "min_value", "max_value"),
      parts.filter(col("part") === "regs")
        .select("pos", "bucket", "rank"))
  }

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
