package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.store.VersionedTable

/** Exactly-once streaming ingest into a [[graft.store.VersionedTable]].
  *
  * `foreachBatch` is at-least-once: Spark replays the last uncommitted
  * batch after a crash, and a sink that blindly appends duplicates it. The
  * versioned table makes the fix one line — each micro-batch commits with
  * an idempotence tag `batch-<batchId>` that the manifest CAS refuses to
  * apply twice ([[VersionedTable.appendBatch]]) — so the data write and the
  * "have I done this batch" marker are ONE atomic publish instead of
  * [[graft.store.ItemStore.commitBatch]]'s file-marker dance. Downstream
  * consumers read consistent snapshots mid-ingest and can tail
  * [[VersionedTable.changeFeed]] between versions.
  */
object VersionedSink {

  def start(stream: DataFrame, root: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (VersionedTable.latestVersion(batch.sparkSession, root).isEmpty)
          VersionedTable.create(batch.sparkSession, root,
            batch.filter(org.apache.spark.sql.functions.lit(false)))
        VersionedTable.appendBatch(batch.sparkSession, root, batch,
          s"batch-$batchId")
        ()
      }
      .start()
}
