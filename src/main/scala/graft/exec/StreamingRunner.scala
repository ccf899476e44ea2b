package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.model.WorkItem
import graft.store.ItemStore

/** T1 — the reference's worker poll loop (`code/runner.py:144-238`) as a
  * Structured Streaming dispatcher: `readStream` over the item-store path,
  * each micro-batch of newly-appended items is claimed, executed and merged
  * by the SAME batch `Runner` path, and the updated rows append to an
  * outcome store. The reference's poll-sleep-refetch cycle (and its lock
  * races) disappear: the stream IS the queue, each item arrives in exactly
  * one micro-batch.
  */
object StreamingRunner {

  /** Open the store as an item stream. */
  def itemStream(spark: SparkSession, storePath: String): DataFrame =
    spark.readStream.schema(WorkItem.schema).parquet(storePath)

  /** Open a CONNECTOR queue directory as a micro-batch stream — the
    * DynamoDB-streams analog of the reference's poll loop
    * (`code/runner.py:144-238`): each queue data file arrives in exactly
    * one micro-batch, with the batch scan's source-side pruning: `state`
    * prunes whole state directories out of every offset listing (the GSI
    * key-condition analog — declared as a read option because Spark's
    * optimizer does not push filters into micro-batch scans).
    * `maxFilesPerTrigger` bounds each trigger's admission.
    */
  def queueStream(spark: SparkSession, queuePath: String,
      maxFilesPerTrigger: Option[Int] = None,
      state: Option[String] = None): DataFrame = {
    val r = spark.readStream.format("graft.store.connector.WorkQueueSource")
      .option("path", queuePath)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    state.foreach(s => r.option("itemState", s))
    r.load()
  }

  /** Connector-stream rows widened to the canonical [[WorkItem]] shape so
    * the dispatchers below can consume a CONNECTOR queue stream directly
    * (before this adapter they only composed with [[itemStream]]'s full
    * store schema): the queue-poll projection carries the identity/state
    * columns the claim and commit machinery needs; payload columns absent
    * from the queue layout (scripts, logs, dates) ride as typed nulls —
    * a null `taskScript` with no nested tasks simply yields no processes,
    * so claim/commit semantics are exercised end to end either way.
    */
  def queueWorkItems(stream: DataFrame): DataFrame = {
    val present = stream.columns.toSet
    stream.select(WorkItem.schema.fields.map { f =>
      if (present(f.name)) col(f.name)
      else if (f.name == "errorDate") lit(false).as(f.name) // non-null flag
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** foreachBatch dispatcher: run every todo item of the micro-batch,
    * append updated items to `resultPath` (an ItemStore-shaped table whose
    * latest row per itemID is the current state). The append is
    * [[ItemStore.commitBatch]] keyed by `batchId` — foreachBatch is
    * at-least-once (a crash after the write replays the batch on restart),
    * and a blind append would record the replayed batch's outcomes twice;
    * the idempotent commit makes the outcome table exactly-once. A batch
    * already marked committed skips execution entirely (no re-run of its
    * scripts either).
    */
  def dispatcher(
      items: DataFrame,
      resultPath: String,
      config: Runner.RunConfig = Runner.RunConfig()): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!ItemStore.batchCommitted(batch.sparkSession, resultPath, batchId)) {
        val (updated, outcomes) = Runner.processItems(batch, config)
        try ItemStore.commitBatch(
          updated.select(WorkItem.schema.fieldNames.map(col): _*), resultPath, batchId)
        finally { outcomes.unpersist(); () }
        ()
      }
    }

  /** [[claimedDispatcher]]'s claim step at LEDGER granularity — the
    * data-pipeline-scale variant (SCALE_PROBE.md round 14): claims are
    * wave-atomic [[graft.store.connector.WorkQueueLedger]] commits (one
    * VersionedTable commit per micro-batch, O(triggers) filesystem
    * objects) instead of one lock file per item (O(items) inodes + blocks
    * — the measured ceiling: ~4.7k claims/s and ~60 GB of lock metadata
    * at the 15M-item probe). Exactly-once across contending dispatchers
    * holds through the ledger's read-validate-commit loop; replayed
    * micro-batches re-use their wave tag and win the SAME items.
    * Per-item leases are not part of this mode — a crashed dispatcher's
    * in-flight wave stays claimed until `work-release` hands it back or
    * a `takeoverMillis`-armed contender's heartbeat scan reclaims it;
    * use [[claimedDispatcher]] where PER-ITEM takeover matters more
    * than claim throughput.
    *
    * State lifecycle per batch (round 15 — the ledger tracks IN-FLIGHT
    * items, not lifetime throughput): filter the batch's todo ids
    * against the compact done set, claim the remainder as a wave,
    * execute, commit outcomes idempotently, then retire the wave —
    * [[graft.store.connector.WorkQueueLedger.markDone]] (one itemID-only
    * idempotent commit) followed by a manifest-only
    * [[graft.store.connector.WorkQueueLedger.release]]. Every step after
    * the outcome commit is tag-idempotent, and a replayed batch that
    * finds its outcomes already committed FINISHES the retirement
    * instead of skipping it, so a crash in any window (after claim /
    * after commit / between markDone and release) resumes to the same
    * end state: outcomes exactly once, ids in the done set, ledger
    * empty. `instanceId` must be STABLE across restarts of the same
    * checkpoint — the wave tag is `instanceId-batch-N`, and a restart
    * under a fresh identity would orphan the crashed wave's claims (the
    * r14 silent-loss defect; the `work` verb now derives its default
    * identity from the checkpoint path).
    *
    * Retirement is OUTCOME-AWARE (round 16 — the r15 VERDICT defect):
    * [[Runner.processItems]] deliberately keeps fully budget-skipped
    * items `todo` ("was never claimed"), so done-marking the whole win
    * set would permanently block the unrun remainder of every
    * budget-cut wave behind the done set. The invariant the done set
    * actually needs is "no claimable work left", and
    * [[Runner.todoTasks]] IS the definition of claimable work — so an
    * id is done-marked iff its updated row yields no todo task: terminal
    * states (`done` / `Wall_Time_Exceeded`) qualify, scriptless
    * monitoring rows qualify (running them again is a no-op), while a
    * budget-skipped item with its script still pending is RELEASED with
    * the wave and returns to claimable — the reference's
    * skip-and-leave-todo semantics (`code/runner.py:126-141`). A
    * replayed batch recomputes the same split from the batch's own
    * deterministically-named outcome files ([[ItemStore.batchItemIds]] /
    * [[ItemStore.batchRows]]), so replay converges to the identical
    * done set.
    *
    * `takeoverMillis` (opt-in) bounds a CRASHED contending dispatcher's
    * wedge: every dispatcher heartbeats `<ledger>/_heartbeats/<instance>`
    * per batch (the `work` verb adds a daemon beat every
    * [[HeartbeatPeriodMillis]] so a slow batch never reads as dead), and
    * a dispatcher with the knob releases any other instance's in-flight
    * waves once that instance's heartbeat is older than the bound —
    * BEFORE claiming, so the freed items are claimable by the very batch
    * that carries them. Choose the bound well above the heartbeat period
    * (minutes, not seconds): a process paused longer than the bound (GC,
    * VM freeze) can be taken over while alive, in which case its own
    * commit is suppressed by the pre-commit ownership check below but
    * its already-forked scripts may have run twice — the classic lease
    * trade-off, same as the lock-file path's `leaseMillis`.
    */
  def ledgerDispatcher(
      items: DataFrame,
      resultPath: String,
      ledgerPath: String,
      instanceId: String,
      config: Runner.RunConfig = Runner.RunConfig(),
      donePath: Option[String] = None,
      takeoverMillis: Option[Long] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      import graft.store.connector.WorkQueueLedger
      val spark = batch.sparkSession
      val done = donePath.getOrElse(s"${ledgerPath}_done")
      val tag = s"$instanceId-batch-$batchId"
      // outcome-commit key scoped by claim identity: workers sharing one
      // results store all number their batches from 0, and an unscoped
      // key would make worker B's batch 0 look already-committed by A's
      val batchKey = s"$instanceId-$batchId"
      val terminalStates = Seq("done", "Wall_Time_Exceeded")
      def retire(terminalIds: DataFrame): Unit = {
        WorkQueueLedger.markDone(spark, done, terminalIds, tag)
        WorkQueueLedger.release(spark, ledgerPath, tag)
      }
      // maintenance cadence — OUTSIDE every win/emptiness guard (r15
      // VERDICT #3: a dispatcher that keeps winning nothing — a contended
      // twin, a replayed tail — still appends one empty tagged claim
      // commit per trigger, so commit log and tag history grow with
      // TRIGGERS, not wins). Every 64 batches the commit LOG is vacuumed
      // back to the head (the done set keeps its data files — they ARE
      // the record; only unreferenced versions drop) and the tag history
      // is capped at 1024, far above the ~1-batch replay horizon. The
      // leaked-file sweep honors a grace window so a contending
      // dispatcher's just-written, not-yet-committed wave files are never
      // vacuumed out from under its commit (r15 ADVICE #2).
      def maintain(): Unit = if (batchId % 64 == 63) {
        // done-set file compaction first (every 4th maintenance tick):
        // one small file lands per trigger, and without packing both the
        // manifest and notDone's file-pruning scan grow O(triggers).
        // Range-sorted packing keeps per-file itemID ranges tight, so
        // graduated files stay prunable AND carry by reference forever —
        // each id is rewritten at most once ever.
        if (batchId % 256 == 255)
          WorkQueueLedger.compactDone(spark, done)
        if (graft.store.VersionedTable.latestVersion(spark, ledgerPath).isDefined)
          graft.store.VersionedTable.vacuum(spark, ledgerPath, 1, Some(1024),
            minAgeMillis = LeakGraceMillis)
        if (graft.store.VersionedTable.latestVersion(spark, done).isDefined)
          graft.store.VersionedTable.vacuum(spark, done, 1, Some(1024),
            minAgeMillis = LeakGraceMillis)
        ()
      }
      WorkQueueLedger.beat(spark, ledgerPath, instanceId)
      takeoverMillis.foreach { bound =>
        WorkQueueLedger.takeoverStale(spark, ledgerPath, instanceId, bound, tag)
      }
      if (ItemStore.batchCommitted(spark, resultPath, batchKey)) {
        // post-commit replay: outcomes are already exactly-once — finish
        // retiring the wave if a crash interrupted markDone/release. The
        // retirable split is recomputed from the committed batch's own
        // files, so a replay retires exactly what the original would
        // have: terminal-state rows, plus todo rows with no claimable
        // task left (scriptless monitoring rows).
        if (graft.store.VersionedTable.latestVersion(spark, ledgerPath).isDefined) {
          val wave = WorkQueueLedger.entries(spark, ledgerPath)
            .filter(col("tag") === tag).select("itemID")
          if (!wave.isEmpty) {
            val todoRows = ItemStore.batchRows(spark, resultPath, batchKey, "todo")
            val taskless = todoRows.select("itemID").join(
              Runner.todoTasks(todoRows).toDF.select("itemID").distinct(),
              Seq("itemID"), "left_anti")
            retire(ItemStore.batchItemIds(spark, resultPath, batchKey,
              terminalStates).unionByName(taskless))
          }
        }
        maintain()
      } else {
        // done-set version BEFORE the pre-claim filter: if it hasn't
        // advanced by the time our claim lands, no competing markDone
        // committed in between and the post-claim re-check below is a
        // proven no-op (zero extra jobs on the steady single-dispatcher
        // trigger path)
        val doneV0 = graft.store.VersionedTable.latestVersion(spark, done)
        val todo = batch.filter(col("itemState") === "todo").select("itemID")
        val won = WorkQueueLedger.claim(spark, ledgerPath,
          WorkQueueLedger.notDone(spark, done, todo), instanceId, tag)
        // post-claim done re-check: the pre-claim notDone and another
        // dispatcher's retire can interleave (their markDone→release gap)
        // so a just-finished id can win a fresh claim here. Once WE hold
        // the claim nobody else can retire those ids, and any competing
        // markDone committed BEFORE its release, which preceded our
        // successful CAS — so its done commit both advanced the done
        // version past `doneV0` AND is visible to this re-check;
        // dropping the id closes the race completely.
        val exec =
          if (graft.store.VersionedTable.latestVersion(spark, done) == doneV0)
            won
          else WorkQueueLedger.notDone(spark, done, won)
        val claimed = batch.join(exec, Seq("itemID"), "left_semi")
        val (updated, outcomes) = Runner.processItems(claimed, config)
        // split the win set by OUTCOME while the task cache is still
        // live (materializing after unpersist would re-fork every
        // script): retirable = executed ids minus those whose updated
        // row STILL yields a claimable task — i.e. budget-skipped work.
        // Without a budget there IS no skip path (every claimed task
        // runs to a terminal row, scriptless rows have no tasks), so the
        // split is skipped entirely — the steady trigger path pays zero
        // extra jobs for the budget fix.
        val retirable =
          if (config.budgetSeconds.isEmpty) exec
          else graft.plans.Lineage.cut(
            exec.select("itemID").join(
              Runner.todoTasks(updated).toDF.select("itemID").distinct(),
              Seq("itemID"), "left_anti"))
        try {
          // pre-commit ownership check (takeover mode only): if a stale-
          // heartbeat takeover released our wave while we ran, the thief
          // owns these items' outcomes now — committing ours too would
          // duplicate them under a second batch key
          val stillOurs = takeoverMillis.isEmpty || won.isEmpty ||
            WorkQueueLedger.entries(spark, ledgerPath)
              .filter(col("tag") === tag).count() > 0
          if (stillOurs)
            ItemStore.commitBatch(
              updated.select(WorkItem.schema.fieldNames.map(col): _*),
              resultPath, batchKey)
          if (stillOurs && !won.isEmpty) retire(retirable)
        } finally { outcomes.unpersist(); () }
        maintain()
        // the wave is retired — free its localCheckpoint blocks NOW so
        // executor storage holds one in-flight wave, not the trigger
        // history (the ContextCleaner would get there eventually; a
        // thousand-trigger worker shouldn't wait on GC pressure)
        graft.plans.Lineage.free(won)
        graft.plans.Lineage.free(retirable)
        ()
      }
    }

  /** Cadence heartbeat period for the `work` verb's daemon beat (the
    * dispatcher also beats once per batch). `--takeover-after` bounds
    * must sit WELL above this — minutes, not seconds.
    */
  val HeartbeatPeriodMillis: Long = 10000L

  /** Grace window for the maintenance vacuum's leaked-file sweep: an
    * unreferenced ledger data file younger than this may be a contending
    * dispatcher's in-flight wave write racing our tick, not a leak.
    */
  val LeakGraceMillis: Long = 600000L

  /** Dispatcher that COEXISTS with external workers: before executing, the
    * batch's todo items are claimed through the connector's conditional
    * write path against a shared lock registry — an item some other worker
    * already holds is skipped (it stays theirs), and items this dispatcher
    * wins are executed exactly once across the fleet. This is the
    * reference's lockItem/verifyItem loop (`code/modifier.py:71-125`) made
    * race-free AND cross-process: any process that speaks the registry
    * protocol (atomic lock-file claims) can share the queue.
    *
    * `leaseMillis` bounds every claim's lifetime: a dispatcher that crashes
    * mid-batch stops renewing and its items become re-claimable one lease
    * later (by anyone — the expired-takeover path in
    * [[graft.store.connector.WorkQueueClaimWrite]]); while the batch runs,
    * a heartbeat thread renews the batch's locks at lease/3 cadence so slow
    * scripts aren't stolen mid-execution. `None` keeps the old non-expiring
    * behavior (and its wedge-until-manual-reset failure mode).
    */
  def claimedDispatcher(
      items: DataFrame,
      resultPath: String,
      registryPath: String,
      instanceId: String,
      config: Runner.RunConfig = Runner.RunConfig(),
      leaseMillis: Option[Long] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // outcome-commit key scoped by claim identity (see ledgerDispatcher):
      // lock-mode workers share one results store the same way
      val batchKey = s"$instanceId-$batchId"
      // replay of a fully committed batch: its outcomes are already in the
      // result table exactly once — skip claiming and execution entirely
      if (!ItemStore.batchCommitted(spark, resultPath, batchKey)) {
      val lockPrefix = s"lock-$instanceId-$batchId-"
      // claim every todo item of the batch via the conditional write path
      batch.filter(col("itemState") === "todo")
        .select(col("itemID"),
          concat(lit(lockPrefix), col("itemID")).as("lockID"),
          lit(instanceId).as("instanceID"),
          lit(null).cast("string").as("expectedLockID"),
          lit(leaseMillis.getOrElse(0L)).as("leaseMillis"))
        .write.format("graft.store.connector.WorkQueueSource")
        .option("path", registryPath).mode("append").save()
      // execute only the items THIS batch won (deterministic lock prefix)
      val won = graft.store.connector.WorkQueueSource.claimResults(spark, registryPath)
        .filter(col("status") === "accepted" &&
          col("lockID").startsWith(lockPrefix))
        .select("itemID")
      val claimed = batch.join(won, Seq("itemID"), "left_semi")
      // the batch's own wins, collected once — bounded by the micro-batch
      // size, not the table; drives the heartbeat AND the terminal-aware
      // pin/release below
      val wonIds = won.collect().map(_.getString(0))
      // heartbeat: keep this batch's leases alive while its scripts run
      val renewer = leaseMillis.map { lease =>
        val ids = wonIds
        // leases the heartbeat failed to renew: another worker took the item
        // over (contract of WorkQueueClaimWrite.renew — the holder must stop
        // working on it), so its results are suppressed below and renewal
        // stops; the new holder produces the item's outcome
        val lost = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
          val t = new Thread(r, s"graft-lease-$instanceId"); t.setDaemon(true); t
        }
        val period = math.max(1L, lease / 3)
        ex.scheduleAtFixedRate(() => ids.foreach { id =>
          if (!lost.contains(id) && !graft.store.connector.WorkQueueClaimWrite.renew(
              registryPath, id, s"$lockPrefix$id", instanceId, lease))
            lost.add(id)
        }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
        (ex, ids, lost)
      }
      // the heartbeat must die on ANY exit path — a renewer outliving a
      // failed batch would keep the crashed items' locks alive forever,
      // exactly the wedge the lease feature exists to prevent
      try {
        val (updated, outcomes) = Runner.processItems(claimed, config)
        // force the script runs NOW (outcomes is a lazy cache): the lost set
        // only means something once every task has actually executed —
        // snapshotting before materialization would always see an empty set
        // and never suppress a taken-over item's results
        outcomes.count()
        val lostIds = renewer.map(_._3.toArray(Array.empty[String]).toSeq)
          .getOrElse(Seq.empty)
        val keep =
          if (lostIds.isEmpty) updated
          else updated.filter(!col("itemID").isin(lostIds: _*))
        // the ids with claimable work STILL PENDING after this run,
        // snapshotted while the task cache is live (post-unpersist it
        // would re-fork scripts): budget-skipped items keep itemState
        // `todo` with their script intact and must return to claimable,
        // not wedge behind this worker's locks (r15 VERDICT #1,
        // locks-mode twin; same todoTasks-based rule as ledger retire)
        val pending = Runner.todoTasks(keep).toDF
          .select("itemID").distinct().collect().map(_.getString(0)).toSet
        // batchId-idempotent commit: a replayed batch (post-append crash)
        // publishes the same deterministic file names, never a second copy
        try ItemStore.commitBatch(
          keep.select(WorkItem.schema.fieldNames.map(col): _*), resultPath, batchKey)
        finally { outcomes.unpersist(); () }
        // stop the heartbeat BEFORE the pin/release pass (a late renew
        // would re-arm an expiry), then per surviving win: a COMPLETED
        // item's lock converts to non-expiring — finished work must look
        // finished, not crashed, or a replayed claim takes it over after
        // one lease and re-executes it. A budget-skipped (non-terminal)
        // item's lock is RELEASED outright: it was never run, and holding
        // it (non-expiring without a lease, one lease longer with one)
        // wedges exactly the remainder the budget knob deferred.
        renewer.foreach { case (ex, _, _) =>
          ex.shutdownNow()
          ex.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
        }
        val lost = renewer.map(_._3.toArray(Array.empty[String]).toSet)
          .getOrElse(Set.empty[String])
        wonIds.filterNot(lost.contains).foreach { id =>
          if (pending(id))
            graft.store.connector.WorkQueueClaimWrite.release(
              registryPath, id, s"$lockPrefix$id")
          else
            graft.store.connector.WorkQueueClaimWrite.renew(
              registryPath, id, s"$lockPrefix$id", instanceId, 0L)
        }
      } finally renewer.foreach(_._1.shutdownNow())
      }
    }
}
