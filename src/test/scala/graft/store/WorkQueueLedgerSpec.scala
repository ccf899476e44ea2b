package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.connector.{WorkQueueLedger, WorkQueueSource}

/** The wave-commit claim protocol: exactly-once item claims across
  * contending dispatchers through read-validate-commit on the table
  * version — no per-item lock files anywhere.
  */
class WorkQueueLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def ids(xs: String*): DataFrame = xs.toDF("itemID")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ledger").toString + "/l"

  private def won(d: DataFrame): Set[String] =
    d.as[String].collect().toSet

  test("sequential contention: second claimer wins only the unclaimed ids") {
    val root = tmp()
    val a = WorkQueueLedger.claim(spark, root, ids("1", "2", "3"), "A", "a-1")
    assert(won(a) === Set("1", "2", "3"))
    val b = WorkQueueLedger.claim(spark, root, ids("2", "3", "4"), "B", "b-1")
    assert(won(b) === Set("4"))
    assert(WorkQueueLedger.entries(spark, root).count() === 4)
  }

  test("replayed wave tag returns the ORIGINAL wins and appends nothing") {
    val root = tmp()
    val first = won(WorkQueueLedger.claim(spark, root, ids("1", "2"), "A", "a-1"))
    val vAfter = VersionedTable.latestVersion(spark, root).get
    // at-least-once replay: same tag, even a different (larger) want-set —
    // the wave must not claim anything new
    val replay = won(WorkQueueLedger.claim(spark, root, ids("1", "2", "3"), "A", "a-1"))
    assert(replay === first)
    assert(VersionedTable.latestVersion(spark, root).get === vAfter,
      "a replayed wave must not commit a new version")
  }

  test("appendIfVersion: stale parent refused, fresh parent accepted") {
    val root = tmp()
    VersionedTable.create(spark, root, Seq(("x", 1L)).toDF("k", "v"))
    val v1 = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.appendIfVersion(spark, root,
      Seq(("y", 2L)).toDF("k", "v"), v1))
    assert(!VersionedTable.appendIfVersion(spark, root,
      Seq(("z", 3L)).toDF("k", "v"), v1),
      "the parent advanced — the conditional commit must refuse, not rebase")
    assert(VersionedTable.read(spark, root).count() === 2)
  }

  test("live race: two claimers over the same ids partition them exactly") {
    val root = tmp()
    val all = (1 to 200).map(_.toString)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(won(WorkQueueLedger.claim(spark, root,
      ids(all: _*), "A", "a-race")))
    val fb = Future(won(WorkQueueLedger.claim(spark, root,
      ids(all: _*), "B", "b-race")))
    val (wa, wb) = (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    assert((wa & wb) === Set.empty, s"an item was won twice: ${wa & wb}")
    assert((wa | wb) === all.toSet, "every item claimed exactly once")
    assert(WorkQueueLedger.entries(spark, root).count() === 200)
  }

  test("release drops a wave's claims; ids become claimable again") {
    val root = tmp()
    WorkQueueLedger.claim(spark, root, ids("1", "2"), "A", "a-1")
    assert(WorkQueueLedger.release(spark, root, "a-1"))
    assert(!WorkQueueLedger.release(spark, root, "a-1"), "release is tagged")
    val again = won(WorkQueueLedger.claim(spark, root, ids("1", "2"), "B", "b-1"))
    assert(again === Set("1", "2"))
  }

  test("ledgerDispatcher end-to-end over a connector queue: exactly-once outcomes") {
    import graft.exec.StreamingRunner
    val dir = java.nio.file.Files.createTempDirectory("graft-leddisp").toFile
    val queue = new java.io.File(dir, "queue").toString
    val results = new java.io.File(dir, "results").toString
    val ledger = new java.io.File(dir, "ledger").toString
    def rows(xs: String*) = xs.toSeq.toDF("itemID")
      .selectExpr("itemID", "itemID AS taskID", "'todo' AS itemState",
        "CAST(0 AS LONG) AS logLength", "CAST(null AS LONG) AS nestedTaskCount")
    WorkQueueSource.append(rows("A", "B").coalesce(1), queue)
    WorkQueueSource.append(rows("C").coalesce(1), queue)
    val q = StreamingRunner.ledgerDispatcher(
        StreamingRunner.queueWorkItems(
          StreamingRunner.queueStream(spark, queue, Some(1))),
        results, ledger, "disp-1")
      .option("checkpointLocation", new java.io.File(dir, "ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = ItemStore.load(spark, results)
    assert(out.count() === 3)
    assert(won(out.select("itemID")) === Set("A", "B", "C"))
    assert(WorkQueueLedger.entries(spark, ledger).count() === 3)
    // no lock files anywhere: the queue dir has no per-item locks
    assert(!new java.io.File(s"$queue/locks").exists() ||
      new java.io.File(s"$queue/locks").list().isEmpty)
  }
}
