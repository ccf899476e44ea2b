package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.connector.{WorkQueueClaimWrite, WorkQueueSource}

class WorkQueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-queue").toString + "/q"
    WorkQueueSource.write(
      DerivedItems.items(spark, sf0001)
        .select($"itemID", $"taskID", $"itemState", $"logLength", $"nestedTaskCount"), p)
    p
  }

  private def queue = spark.read
    .format("graft.store.connector.WorkQueueSource")
    .option("path", path).load()

  test("connector round-trips the queue with correct values") {
    val viaConnector = queue.select($"itemID", $"itemState", $"logLength")
      .as[(String, String, Long)].collect().toSet
    val direct = DerivedItems.items(spark, sf0001)
      .select($"itemID", $"itemState", $"logLength")
      .as[(String, String, Long)].collect().toSet
    assert(viaConnector === direct)
  }

  test("itemState equality pushes down and prunes state directories (GSI analog)") {
    val q = queue.filter($"itemState" === "todo")
    val rows = q.count()
    val expected = DerivedItems.items(spark, sf0001)
      .filter($"itemState" === "todo").count()
    assert(rows === expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedState=Some(todo)"), plan.take(600))
  }

  test("column pruning reaches the reader (ProjectionExpression analog, P1)") {
    val q = queue.select($"itemID")
    assert(q.count() === 1500)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("columns=itemID") && !plan.contains("columns=itemID,taskID"),
      plan.take(600))
  }

  test("point lookup pushes itemID equality AND limit to the source (GSI point read)") {
    val anyId = DerivedItems.items(spark, sf0001)
      .filter($"itemState" === "todo").select($"itemID").as[String].head()
    // S4/S5 shape: key equality + LIMIT 1
    val q = queue.filter($"itemState" === "todo" && $"itemID" === anyId)
      .select($"itemID", $"itemState", $"logLength").limit(1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(s"pushedId=Some($anyId)"), plan.take(800))
    assert(plan.contains("pushedLimit=Some(1)"), plan.take(800))
    // both filters left the post-scan plan (fully pushed), values correct
    val row = q.as[(String, String, Long)].head()
    assert(row._1 === anyId && row._2 === "todo")
    // without a limit the scan carries no pushed limit and still matches
    val all = queue.filter($"itemID" === anyId)
      .select($"itemID").as[String].collect()
    assert(all.toSeq === Seq(anyId))
  }

  test("pushed limit bounds rows per partition but never drops matches") {
    // limit > matches: every matching row still comes back
    val q = queue.filter($"itemState" === "todo").limit(1000000)
    val expected = DerivedItems.items(spark, sf0001)
      .filter($"itemState" === "todo").count()
    assert(q.count() === expected)
    // limit < matches: exactly limit rows survive the global limit
    assert(queue.limit(7).count() === 7)
  }

  test("state-count aggregate pushes down completely (index COUNT analog)") {
    val q = queue.groupBy($"itemState").count()
    val viaConnector = q.as[(String, Long)].collect().toMap
    val direct = DerivedItems.items(spark, sf0001)
      .groupBy($"itemState").count().as[(String, Long)].collect().toMap
    assert(viaConnector === direct)
    // the plan carries the complete-pushdown scan and NO aggregate over rows
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WorkQueueCountScan"), plan.take(800))
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must leave no Spark-side aggregate:\n${plan.take(800)}")
    // composes with the pushed state filter: single pruned directory
    val one = queue.filter($"itemState" === "todo").groupBy($"itemState").count()
    assert(one.as[(String, Long)].collect().toMap === direct.view.filterKeys(_ == "todo").toMap)
    assert(one.queryExecution.executedPlan.toString.contains("pushedState=Some(todo)"))
  }

  test("itemID filter + state-count aggregate: pushdown keeps the filter (point count)") {
    val anyId = DerivedItems.items(spark, sf0001)
      .filter($"itemState" === "todo").select($"itemID").as[String].head()
    // the round-8 wrong-results shape: itemID equality pushed AND the
    // count-by-state aggregate pushed — the count scan must honor the id
    val q = queue.filter($"itemID" === anyId).groupBy($"itemState").count()
    val got = q.as[(String, Long)].collect().toMap
    val expected = DerivedItems.items(spark, sf0001)
      .filter($"itemID" === anyId).groupBy($"itemState").count()
      .as[(String, Long)].collect().toMap
    assert(got === expected)
    assert(got === Map("todo" -> 1L))
    // still a complete pushdown: the count scan carries the id, no Spark agg
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WorkQueueCountScan"), plan.take(800))
    assert(plan.contains(s"pushedId=Some($anyId)"), plan.take(800))
    assert(!plan.contains("HashAggregate"), plan.take(800))
    // composes with a pushed state filter too
    val both = queue.filter($"itemState" === "todo" && $"itemID" === anyId)
      .groupBy($"itemState").count()
    assert(both.as[(String, Long)].collect().toMap === Map("todo" -> 1L))
  }

  test("state-count aggregate emits no group for states with zero matches") {
    // an id that matches nothing: a real GROUP BY yields zero groups, so the
    // pushed-down scan must not invent (state, 0) rows
    val q = queue.filter($"itemID" === "no_such_item").groupBy($"itemState").count()
    assert(q.collect().isEmpty)
  }

  test("item sink: separators round-trip, embedded newlines fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-queue-sink").toString + "/q"
    val rows = Seq(
      ("id,with,commas", "task\"quoted\"", "todo", 3L, Some(5L)),
      ("plain", "t1", "s,tate", 0L, None))
      .toDF("itemID", "taskID", "itemState", "logLength", "nestedTaskCount")
    WorkQueueSource.write(rows, dir)
    val back = spark.read.format("graft.store.connector.WorkQueueSource")
      .option("path", dir).load()
      .as[(String, String, String, Long, Option[Long])].collect().toSet
    assert(back === Set(
      ("id,with,commas", "task\"quoted\"", "todo", 3L, Some(5L)),
      ("plain", "t1", "s,tate", 0L, None)))
    // a newline in a value cannot round-trip a line-based layout: reject
    val bad = Seq(("id\nnewline", "t", "todo", 0L, Some(0L)))
      .toDF("itemID", "taskID", "itemState", "logLength", "nestedTaskCount")
    val e = intercept[Exception](WorkQueueSource.write(bad, dir + "2"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("must not embed newlines"))), e.toString)
  }

  test("format=parquet: round-trip, pushdown and metadata count match the CSV layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-queue-pq").toString + "/q"
    val items = DerivedItems.items(spark, sf0001)
      .select($"itemID", $"taskID", $"itemState", $"logLength", $"nestedTaskCount")
    WorkQueueSource.write(items, dir, format = "parquet")
    // only parquet data files landed, none invisible/in-progress
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("itemState=")).flatMap(_.listFiles())
      .filterNot(_.getName.startsWith("."))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".parquet")),
      files.map(_.getName).mkString(","))
    val pq = spark.read.format("graft.store.connector.WorkQueueSource")
      .option("path", dir).load()
    // identical values to the CSV layout of the same rows
    assert(pq.select($"itemID", $"itemState", $"logLength")
        .as[(String, String, Long)].collect().toSet ===
      queue.select($"itemID", $"itemState", $"logLength")
        .as[(String, String, Long)].collect().toSet)
    // pushdown surface identical: state prune + point lookup + limit
    val anyId = items.filter($"itemState" === "todo")
      .select($"itemID").as[String].head()
    val point = pq.filter($"itemState" === "todo" && $"itemID" === anyId)
      .select($"itemID").limit(1)
    val plan = point.queryExecution.executedPlan.toString
    assert(plan.contains("pushedState=Some(todo)") &&
      plan.contains(s"pushedId=Some($anyId)") &&
      plan.contains("pushedLimit=Some(1)"), plan.take(800))
    assert(point.as[String].head() === anyId)
    // complete count pushdown answers from parquet footers
    val counts = pq.groupBy($"itemState").count()
    assert(counts.queryExecution.executedPlan.toString.contains("WorkQueueCountScan"))
    assert(counts.as[(String, Long)].collect().toMap ===
      items.groupBy($"itemState").count().as[(String, Long)].collect().toMap)
    // ... and honors a pushed itemID filter
    assert(pq.filter($"itemID" === anyId).groupBy($"itemState").count()
      .as[(String, Long)].collect().toMap === Map("todo" -> 1L))
    // mixed layout: CSV appended next to parquet reads as one queue
    WorkQueueSource.append(items.limit(5), dir, format = "csv")
    assert(pq.count() === items.count() + 5)
  }

  test("format=parquet: null/separator value semantics identical to CSV") {
    val rows = Seq(
      ("id,with,commas", "task\"quoted\"", "todo", 3L, Some(5L)),
      ("plain", null.asInstanceOf[String], "s,tate", 0L, None))
      .toDF("itemID", "taskID", "itemState", "logLength", "nestedTaskCount")
    def roundTrip(format: String): Set[(String, String, String, Long, Option[Long])] = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-q-$format")
        .toString + "/q"
      WorkQueueSource.write(rows, d, format)
      spark.read.format("graft.store.connector.WorkQueueSource")
        .option("path", d).load()
        .as[(String, String, String, Long, Option[Long])].collect().toSet
    }
    // format choice must never change values — including the null-string ->
    // "" convention the line layout imposes
    assert(roundTrip("parquet") === roundTrip("csv"))
  }

  private def claim(dir: String, rows: Seq[(String, String, String, String)]): Unit =
    rows.toDF("itemID", "lockID", "instanceID", "expectedLockID")
      .write.format("graft.store.connector.WorkQueueSource")
      .option("path", dir).mode("append").save()

  private def results(dir: String): Set[(String, String, String)] =
    WorkQueueSource.claimResults(spark, dir)
      .as[(String, String, String)].collect().toSet

  test("concurrent claims: exactly one winner per item, loser surfaces the holder") {
    val dir = java.nio.file.Files.createTempDirectory("graft-claims").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val items = (0 until 8).map(i => s"item_$i")
    val a = Future(claim(dir, items.map(id => (id, "lockA", "worker-a", null))))
    val b = Future(claim(dir, items.map(id => (id, "lockB", "worker-b", null))))
    Await.result(a, 2.minutes)
    Await.result(b, 2.minutes)

    val res = WorkQueueSource.claimResults(spark, dir)
      .as[(String, String, String)].collect()
    // every item appears exactly twice: one accepted claim, one rejected
    for (id <- items) {
      val byStatus = res.filter(_._1 == id).groupBy(_._2)
      assert(byStatus("accepted").length === 1, s"$id: ${byStatus.mkString}")
      assert(byStatus("rejected").length === 1, s"$id: ${byStatus.mkString}")
      val winner = byStatus("accepted").head._3
      // the loser is told the CURRENT holder — race-free verifyItem
      assert(byStatus("rejected").head._3 === winner)
      assert(Set("lockA", "lockB").contains(winner))
    }
  }

  test("conditional re-claim: matching expectation swaps, stale expectation rejects") {
    val dir = java.nio.file.Files.createTempDirectory("graft-claims2").toString
    claim(dir, Seq(("item_x", "lock1", "w1", null)))
    // stale expectation loses and learns the holder
    claim(dir, Seq(("item_x", "lock9", "w9", "nope")))
    // matching expectation renews the lock
    claim(dir, Seq(("item_x", "lock2", "w2", "lock1")))
    // claim of a never-locked item with an expectation is rejected
    claim(dir, Seq(("item_y", "lock3", "w3", "lock1")))
    val res = results(dir)
    assert(res.contains(("item_x", "accepted", "lock1"))) // initial claim
    assert(res.contains(("item_x", "rejected", "lock1"))) // stale reclaim told the holder
    assert(res.contains(("item_x", "accepted", "lock2"))) // matching reclaim swapped
    assert(res.contains(("item_y", "rejected", ""))) // no current holder

    // ids and lock tokens with separators survive the whole round trip
    val dir2 = java.nio.file.Files.createTempDirectory("graft-claims3").toString
    claim(dir2, Seq(("it,em\nx", "lo,ck\"1", "w,1", null)))
    claim(dir2, Seq(("it,em\nx", "lock2", "w2", "lo,ck\"1")))
    val r2 = results(dir2)
    assert(r2.contains(("it,em\nx", "accepted", "lo,ck\"1")))
    assert(r2.contains(("it,em\nx", "accepted", "lock2"))) // comma-lock reclaim matched
    val lockFile = java.nio.file.Paths.get(dir, "locks", "item_x.lock")
    val content = new String(java.nio.file.Files.readAllBytes(lockFile), "UTF-8")
    assert(content === "lock2,w2,0") // no lease column -> non-expiring (0)
  }

  private def claimLeased(dir: String,
      rows: Seq[(String, String, String, String, Long)]): Unit =
    rows.toDF("itemID", "lockID", "instanceID", "expectedLockID", "leaseMillis")
      .write.format("graft.store.connector.WorkQueueSource")
      .option("path", dir).mode("append").save()

  test("lease expiry: a dead holder's lock is taken over, a live one is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease").toString
    // live-lease rejection on its own item with a lease far longer than any
    // suite-load scheduling delay (a short lease here flakes: if the second
    // claim's job launches late, the lease has already expired and the
    // takeover is legitimately accepted)
    claimLeased(dir, Seq(("item_live", "lockLive", "w1", null, 600000L)))
    claimLeased(dir, Seq(("item_live", "lockEarly", "w2", null, 60000L)))
    // expiry takeover on a separate item: holder claims with a short lease,
    // then "crashes" (never renews); the sleep only makes it MORE expired,
    // so this direction cannot flake under load
    claimLeased(dir, Seq(("item_l", "lockOld", "dead-worker", null, 400L)))
    Thread.sleep(900)
    claimLeased(dir, Seq(("item_l", "lockNew", "w3", null, 60000L)))
    val res = results(dir)
    assert(res.contains(("item_live", "accepted", "lockLive")))
    assert(res.contains(("item_live", "rejected", "lockLive"))) // live -> told holder
    assert(res.contains(("item_l", "accepted", "lockOld")))
    assert(res.contains(("item_l", "accepted", "lockNew"))) // expired takeover
    val st = WorkQueueClaimWrite.lockState(dir, "item_l")
    assert(st.map(_._1) === Some("lockNew"))
    // a non-expiring lock (no lease) is NEVER taken over by expiry
    claimLeased(dir, Seq(("item_p", "lockP", "w1", null, 0L)))
    Thread.sleep(50)
    claimLeased(dir, Seq(("item_p", "lockQ", "w2", null, 60000L)))
    assert(results(dir).contains(("item_p", "rejected", "lockP")))
  }

  test("lease renewal extends expiry; a lost lock refuses to renew") {
    val dir = java.nio.file.Files.createTempDirectory("graft-renew").toString
    claimLeased(dir, Seq(("item_r", "lockR", "w1", null, 60000L)))
    val e1 = WorkQueueClaimWrite.lockState(dir, "item_r").get._3
    assert(e1 > 0)
    Thread.sleep(30)
    // heartbeat: same holder pushes expiry strictly out
    assert(WorkQueueClaimWrite.renew(dir, "item_r", "lockR", "w1", 60000L))
    val e2 = WorkQueueClaimWrite.lockState(dir, "item_r").get._3
    assert(e2 > e1, s"renewal must extend: $e2 <= $e1")
    // a non-holder cannot renew
    assert(!WorkQueueClaimWrite.renew(dir, "item_r", "lockStale", "w9", 60000L))
    assert(WorkQueueClaimWrite.lockState(dir, "item_r").get._1 === "lockR")
    // renewal of a never-claimed item is a no-op false
    assert(!WorkQueueClaimWrite.renew(dir, "item_missing", "x", "w", 1000L))
  }

  test("expired-takeover race: exactly one of two concurrent claimants wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease-race").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val items = (0 until 6).map(i => s"exp_$i")
    claimLeased(dir, items.map(id => (id, "lockDead", "dead", null, 300L)))
    Thread.sleep(800)
    // two workers race for the expired locks through the CAS takeover path
    val a = Future(claimLeased(dir, items.map(id => (id, "lockA", "wa", null, 60000L))))
    val b = Future(claimLeased(dir, items.map(id => (id, "lockB", "wb", null, 60000L))))
    Await.result(a, 2.minutes)
    Await.result(b, 2.minutes)
    val res = WorkQueueSource.claimResults(spark, dir)
      .as[(String, String, String)].collect()
    for (id <- items) {
      val after = res.filter(r => r._1 == id && r._3 != "lockDead")
      assert(after.count(_._2 == "accepted") === 1, s"$id: ${after.mkString}")
      assert(after.count(_._2 == "rejected") === 1, s"$id: ${after.mkString}")
      // the loser is told the WINNER (not the dead holder)
      val winner = after.find(_._2 == "accepted").get._3
      assert(after.find(_._2 == "rejected").get._3 === winner)
    }
  }
}
