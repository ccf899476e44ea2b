package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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

  /** foreachBatch dispatcher: run every todo item of the micro-batch,
    * append updated items to `resultPath` (an ItemStore-shaped table whose
    * latest row per itemID is the current state).
    */
  def dispatcher(
      items: DataFrame,
      resultPath: String,
      config: Runner.RunConfig = Runner.RunConfig()): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (updated, outcomes) = Runner.processItems(batch, config)
      try ItemStore.append(updated.select(WorkItem.schema.fieldNames.map(col): _*), resultPath)
      finally { outcomes.unpersist(); () }
    }
}
