package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.exec.StreamingRunner
import graft.model.WorkItem
import graft.store.ItemStore
import graft.store.connector.WorkQueueSource

/** Scale probe for the connector STREAMING read + claim path (SCALE_PROBE
  * cadence, round 14): drive [[StreamingRunner.claimedDispatcher]] itself
  * over a large work queue — the r11/r13 probes covered the batch connector
  * and spec'd the `MicroBatchStream`, but the streaming dispatcher's
  * end-to-end volume (admission → per-item conditional claim → idempotent
  * outcome commit) had only ridden gate-scale runs.
  *
  * Items carry NO scripts (`taskScript` null, no nested tasks): the probe
  * measures the CONNECTOR machinery — micro-batch file admission, the
  * lock-file claim protocol, claim-result materialization, outcome commit —
  * not subprocess forks, which belong to the workload, not the engine.
  *
  * Usage:
  *   runMain graft.probe.ConnectorStreamProbe [nItems] [files] [mfpt] [mode]
  * mode = `locks` (per-item lock files, [[StreamingRunner.claimedDispatcher]])
  *      | `ledger` (wave commits, [[StreamingRunner.ledgerDispatcher]] —
  *        O(triggers) filesystem objects, the data-pipeline scale path)
  * Prints one JSON line:
  *   items, wall_s, items_per_sec, triggers,
  *   accepted (must == items), accepted_distinct (must == items),
  *   result_rows (must == items — exactly-once outcome commit),
  *   lock_files (locks mode: == items — itself the measured finding;
  *   ledger mode: 0), ckpt_bytes (source/commit log growth — bounded by
  *   O(files) entries, not items).
  */
object ConnectorStreamProbe {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(15000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(8)
    val mfpt = args.lift(2).map(_.toInt).getOrElse(2)
    val mode = args.lift(3).getOrElse("ledger")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-connector-stream-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-connprobe")
    val queue = s"$base/queue"
    val results = s"$base/results"
    val ckpt = s"$base/ckpt"

    // 1. the 100×-scale queue: n todo items across `files` data files
    val t0 = System.nanoTime()
    val items = spark.range(n).select(
      concat(lit("item-"), col("id")).as("itemID"),
      concat(lit("task-"), col("id")).as("taskID"),
      lit(null).cast("string").as("taskScript"),
      lit(null).cast(WorkItem.schema("nestedTasks").dataType).as("nestedTasks"),
      lit("todo").as("itemState"),
      lit(null).cast("string").as("lockID"),
      lit(null).cast("string").as("instanceID"),
      lit(null).cast("timestamp").as("lockDate"),
      lit(null).cast("timestamp").as("doneDate"),
      lit(false).as("errorDate"),
      lit(null).cast(WorkItem.schema("log").dataType).as("log"),
      lit(0L).as("logLength"),
      lit(null).cast("long").as("nestedTaskCount"))
      .repartition(files)
    WorkQueueSource.append(items, queue, "parquet")
    val buildS = (System.nanoTime() - t0) / 1e9

    // 2. the streaming dispatcher with claim semantics ON (shared-registry
    // conditional writes; leases off — a clean run, no takeover churn)
    val t1 = System.nanoTime()
    val stream = StreamingRunner.queueWorkItems(
      StreamingRunner.queueStream(spark, queue, Some(mfpt)))
    val ledgerPath = s"$base/ledger"
    val writer = mode match {
      case "locks" =>
        StreamingRunner.claimedDispatcher(stream, results, queue, "probe-1")
      case _ =>
        StreamingRunner.ledgerDispatcher(stream, results, ledgerPath, "probe-1")
    }
    val q = writer.option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val wallS = (System.nanoTime() - t1) / 1e9

    // 3. accounting — every bound here is an exactly-once claim. Ledger
    // mode (round 15): finished waves are RELEASED and their ids live in
    // the compact done set, so the durable claim record is `_done`, and
    // the ledger itself must be EMPTY after a clean drain (asserted via
    // ledger_left below).
    val claims =
      if (mode == "locks")
        WorkQueueSource.claimResults(spark, queue)
          .filter(col("status") === "accepted").select("itemID")
      else graft.store.connector.WorkQueueLedger
        .doneEntries(spark, s"${ledgerPath}_done").select("itemID")
    val ledgerLeft =
      if (mode == "locks") 0L
      else graft.store.connector.WorkQueueLedger.entries(spark, ledgerPath)
        .count()
    val accepted = claims.count()
    val acceptedDistinct = claims.distinct().count()
    val resultRows = ItemStore.load(spark, results).count()
    val lockFiles = Option(new java.io.File(s"$queue/locks").list())
      .map(_.length.toLong).getOrElse(0L)
    def du(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else f.length()
    val ckptBytes = du(new java.io.File(ckpt))
    val triggers = Option(new java.io.File(s"$ckpt/commits").list())
      .map(_.count(!_.startsWith("."))).getOrElse(0)

    println(
      s"""{"items": $n, "files": $files, "mfpt": $mfpt, "mode": "$mode", """ +
      s""""build_s": ${f"$buildS%.1f"}, "wall_s": ${f"$wallS%.1f"}, """ +
      s""""items_per_sec": ${(n / wallS).toLong}, "triggers": $triggers, """ +
      s""""accepted": $accepted, "accepted_distinct": $acceptedDistinct, """ +
      s""""result_rows": $resultRows, "lock_files": $lockFiles, """ +
      s""""ledger_left": $ledgerLeft, "ckpt_bytes": $ckptBytes}""")
    spark.stop()
  }
}
