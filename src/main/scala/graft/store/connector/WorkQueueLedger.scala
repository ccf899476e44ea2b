package graft.store.connector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.VersionedTable

/** Claim LEDGER — the work-queue claim protocol at COMMIT granularity
  * instead of lock-file-per-item granularity.
  *
  * Why this exists (round-14 scale probe, SCALE_PROBE.md): the lock-file
  * registry ([[WorkQueueClaimWrite]]) pays one filesystem object per item —
  * one inode + one block (~4 KB) of pure claim metadata, created serially
  * per item inside each write task. At the reference's real operating
  * scale (thousands of long-running jobs) that is the right shape: leases,
  * renewal and per-item takeover need per-item files. At data-pipeline
  * scale it is a measured ceiling: the 15M-item probe ran its claims at
  * ~4.7k items/s and would have written ~60 GB / 15M inodes of lock
  * metadata — more filesystem objects than the data files themselves by
  * four orders of magnitude.
  *
  * The ledger replaces per-item files with claim WAVES: one
  * [[VersionedTable]] commit per micro-batch, holding one row per claimed
  * item `(itemID, instanceID, lockID, tag)`. Exactly-once across
  * contending dispatchers comes from read-validate-commit on the table
  * version ([[VersionedTable.appendIfVersion]]): a claimer reads the
  * ledger at version v, anti-joins the items already claimed, and commits
  * its wave conditional on the parent still being v — a lost race re-reads
  * and re-validates, so two dispatchers racing over the same queue files
  * partition the items (no item is ever won twice; spec-asserted under a
  * live thread race). Replay (foreachBatch is at-least-once) is the
  * `tag`: a wave whose tag is already committed returns its ORIGINAL win
  * set and appends nothing.
  *
  * Trade-offs vs the lock-file path, stated honestly: claims are
  * wave-atomic, so contending claimers serialize on the table CAS (fine
  * for dispatcher-per-queue deployments, the streaming shape; the
  * lock-file path remains the right tool for many independent workers
  * claiming single items), and leases/expiry are not implemented here —
  * a crashed ledger dispatcher's unfinished items stay claimed until
  * [[release]] (the lock-file path's lease takeover covers the
  * long-running-script deployment).
  */
object WorkQueueLedger {

  private def emptyLedger(spark: SparkSession): DataFrame =
    spark.range(0).select(
      lit("").as("itemID"), lit("").as("instanceID"),
      lit("").as("lockID"), lit("").as("tag"))

  private def ensure(spark: SparkSession, root: String): Unit =
    if (VersionedTable.latestVersion(spark, root).isEmpty)
      try { VersionedTable.create(spark, root, emptyLedger(spark)); () }
      catch {
        // lost the create race to a concurrent claimer: the table exists,
        // which is all ensure() promises
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("already exists") =>
      }

  /** Claim every id in `wantIds` (column `itemID`) not already claimed.
    * Returns the win set (itemID rows, materialized). `tag` makes the wave
    * idempotent: a replay returns the original wins without re-appending.
    */
  def claim(spark: SparkSession, root: String, wantIds: DataFrame,
      instanceId: String, tag: String, maxRetries: Int = 20): DataFrame = {
    ensure(spark, root)
    var tries = 0
    while (tries < maxRetries) {
      val head = VersionedTable.snapshot(spark, root)
      if (head.tags.contains(tag))
        // replayed wave: its rows are already in the ledger, exactly once
        return VersionedTable.read(spark, root)
          .filter(col("tag") === tag).select("itemID")
          .transform(graft.plans.Lineage.cut)
      val ledger = VersionedTable.read(spark, root, Some(head.version))
      // materialize the wave BEFORE the commit attempt: appendIfVersion
      // writes `mine`'s rows to data files first, and a lazily-planned
      // anti-join re-evaluated during the write must not see a newer
      // ledger state than the version the commit is conditioned on
      val mine = wantIds.select(col("itemID")).distinct()
        .join(ledger.select("itemID"), Seq("itemID"), "left_anti")
        .select(col("itemID"), lit(instanceId).as("instanceID"),
          concat(lit(s"$tag-"), col("itemID")).as("lockID"),
          lit(tag).as("tag"))
        .transform(graft.plans.Lineage.cut)
      if (VersionedTable.appendIfVersion(spark, root, mine,
          head.version, Some(tag)))
        return mine.select("itemID")
      tries += 1
    }
    sys.error(s"ledger claim lost the commit race $maxRetries times at $root")
  }

  /** Release a finished wave's claims (the done-with-the-batch
    * counterpart): one tagged overwrite dropping the wave's rows.
    */
  def release(spark: SparkSession, root: String, tag: String): Boolean =
    VersionedTable.overwriteBatch(spark, root,
      VersionedTable.read(spark, root).filter(col("tag") =!= tag),
      s"release-$tag")

  /** The full ledger (itemID, instanceID, lockID, tag). */
  def entries(spark: SparkSession, root: String): DataFrame =
    VersionedTable.read(spark, root)
}
