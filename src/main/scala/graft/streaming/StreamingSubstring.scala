package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup
import graft.store.VersionedTable

/** Streaming twin of the incremental exact substring dedup
  * ([[Dedup.substringAgainst]]): micro-batches of new docs pair against a
  * persisted, GROWING gram index — corpus plus every previously ingested
  * stream doc — so the accumulated pair set (ids AND n_shared counts) is
  * EXACTLY the batch operator's result over all stream docs at once,
  * including pairs BETWEEN docs of different micro-batches.
  *
  * Simpler than [[StreamingPpjoin]] in one important way: char grams are a
  * pure per-doc function (no corpus-statistic ranking), so the index
  * extends by plain append and incremental exactness needs no shared-order
  * argument at all.
  *
  * Exactly-once: two [[VersionedTable]]s (emitted pairs, gram index
  * extension) each commit under the `batch-<id>` idempotence tag. Pairs
  * commit FIRST: a replay after any crash recomputes against whatever
  * extension state exists, but its pairs append is refused by the tag, so
  * partially-applied extensions can never double-emit.
  */
object StreamingSubstring {

  private def pairsRoot(root: String) = s"$root/pairs"
  private def gramsRoot(root: String) = s"$root/ext_grams"

  private def ensure(spark: SparkSession, tableRoot: String,
      like: DataFrame): Unit =
    if (VersionedTable.latestVersion(spark, tableRoot).isEmpty)
      VersionedTable.create(spark, tableRoot, like.filter(lit(false)))

  /** One micro-batch: pair `batch` against corpusIndex ⊕ extension-so-far,
    * then fold the batch's grams into the extension. Public so the parity
    * spec can drive (and replay) batches directly.
    */
  def processBatch(corpusIndex: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, l: Int, root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val tag = s"batch-$batchId"
    val bg = Dedup.substringIndex(batch, idCol, textCol, l)
    ensure(spark, gramsRoot(root), bg)
    val effective = corpusIndex
      .unionByName(VersionedTable.read(spark, gramsRoot(root)))
    val pairs = Dedup.substringAgainst(effective, batch, idCol, textCol, l)
    ensure(spark, pairsRoot(root), pairs)
    VersionedTable.appendBatch(spark, pairsRoot(root), pairs, tag)
    VersionedTable.appendBatch(spark, gramsRoot(root), bg, tag)
  }

  /** Accumulated substring-dedup pairs emitted so far. */
  def pairs(spark: SparkSession, root: String): DataFrame =
    VersionedTable.read(spark, pairsRoot(root))

  def start(stream: DataFrame, corpusIndex: DataFrame, idCol: String,
      textCol: String, l: Int, root: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(corpusIndex, batch, idCol, textCol, l, root, batchId)
      }
      .start()
}
