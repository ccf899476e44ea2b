package graft.store.connector

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Batch row-insert path for [[WorkQueueSource]] — the write half that makes
  * the connector a full source/sink pair (the reference's batch `put_item`
  * import loop, `code/manager.py:278-358`; here the rows land in the same
  * `itemState=<s>/` layout every read path already scans).
  *
  * Commit protocol (the moral of a DSv2 sink, scaled to the filesystem
  * demo): each task streams its rows into INVISIBLE temp files (dot-prefix,
  * no `.csv` suffix — readers only pick up `*.csv`), the task's commit
  * message carries the temp paths, and the JOB commit renames them into
  * visible `part-<query>-<task>-<state>.csv` names — same-directory renames,
  * so a reader never observes a torn file and an abort just deletes temps.
  * A re-executed task (speculation, retry) writes fresh temps under its own
  * attempt's UUID; only the committed attempt's files are published.
  */
class WorkQueueItemWrite(path: String, schema: StructType, queryId: String)
    extends WriteBuilder with Write with BatchWrite {

  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def description(): String = s"WorkQueueItemWrite(path=$path)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ItemWriterFactory(path, schema, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: ItemCommitMessage => m }.foreach { m =>
      m.tempFiles.foreach { case (tmp, finalName) =>
        val src = Paths.get(tmp)
        if (!Files.exists(src))
          throw new java.io.IOException(s"committed task file vanished: $tmp")
        Files.move(src, src.resolveSibling(finalName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: ItemCommitMessage => m }
      .foreach(_.tempFiles.foreach { case (tmp, _) =>
        Files.deleteIfExists(Paths.get(tmp)); ()
      })
}

final case class ItemCommitMessage(tempFiles: Seq[(String, String)])
    extends WriterCommitMessage

class ItemWriterFactory(path: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ItemWriter(path, schema, queryId, partitionId, taskId)
}

/** Streams rows into one temp file per itemState directory. The stored
  * field order is the reader's contract: (itemID, taskID, logLength,
  * nestedTaskCount) — itemState is the directory, never a stored column.
  */
class ItemWriter(path: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val idx = WorkQueueSource.schema.fieldNames
    .map(n => n -> (if (schema.fieldNames.contains(n)) schema.fieldIndex(n) else -1))
    .toMap
  private val attempt = java.util.UUID.randomUUID().toString
  // state -> (tempPath, finalName, writer)
  private val open = scala.collection.mutable.Map
    .empty[String, (String, String, java.io.Writer)]

  // field encoding shared with the reader's splitter (round-trip is
  // property-checked in GraftProps); embedded newlines fail loudly — the
  // layout is line-based and a quoted newline would span two lines
  private def quote(s: String): String = WorkQueueCsv.quote(s)

  private def str(row: InternalRow, field: String): String = {
    val i = idx(field)
    if (i < 0 || row.isNullAt(i)) null else row.getUTF8String(i).toString
  }
  private def lng(row: InternalRow, field: String): String = {
    val i = idx(field)
    if (i < 0 || row.isNullAt(i)) "" else row.getLong(i).toString
  }

  override def write(row: InternalRow): Unit = {
    val state = str(row, "itemState")
    require(state != null, "itemState must not be null in a queue row")
    val (_, _, w) = open.getOrElseUpdate(state, {
      val dir = Paths.get(path, "itemState=" + WorkQueueClaimWrite.escapeToken(state))
      Files.createDirectories(dir)
      val base = s"$queryId-$partitionId-$taskId-$attempt"
      val tmp = dir.resolve(s".inprogress-$base")
      (tmp.toString, s"part-$base-${WorkQueueClaimWrite.escapeToken(state)}.csv",
        Files.newBufferedWriter(tmp, StandardCharsets.UTF_8))
    })
    w.write(quote(str(row, "itemID")))
    w.write(',')
    w.write(quote(str(row, "taskID")))
    w.write(',')
    w.write(lng(row, "logLength"))
    w.write(',')
    w.write(lng(row, "nestedTaskCount"))
    w.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._3.close())
    ItemCommitMessage(open.values.map { case (tmp, fin, _) => (tmp, fin) }.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (tmp, _, w) =>
      try w.close() catch { case _: java.io.IOException => () }
      Files.deleteIfExists(Paths.get(tmp))
      ()
    }
  }

  override def close(): Unit = ()
}
