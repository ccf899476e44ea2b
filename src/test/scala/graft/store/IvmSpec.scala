package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ivm").toString + "/t"

  private def summaryOf(root: String) =
    Ivm.summarize(VersionedTable.read(spark, root), Seq("g"), "v")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3.doubleValue)).toSet

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3.doubleValue)).toSet

  test("maintained summary equals recompute across append / merge / delete") {
    val root = tmp()
    VersionedTable.create(spark, root,
      (1L to 50L).map(k => (k, s"g${k % 5}", k * 1.5)).toDF("k", "g", "v"))
    var s = Ivm.summarize(VersionedTable.read(spark, root), Seq("g"), "v")
      .localCheckpoint()

    def step(commit: => Long): Unit = {
      val v = commit
      s = Ivm.applyDelta(s,
        VersionedTable.changeFeedRows(spark, root, v - 1, v, "k"),
        Seq("g"), "v").localCheckpoint()
      assert(asSet(s) === summaryOf(root),
        s"incremental summary diverged from recompute at version $v")
    }

    step(VersionedTable.append(spark, root,
      (51L to 70L).map(k => (k, s"g${k % 5}", k * 1.5)).toDF("k", "g", "v")))
    // group-moving update: keys 10,20 change BOTH group and value
    step(VersionedTable.merge(spark, root,
      Seq((10L, "moved", 999.25), (20L, "moved", 0.75), (71L, "g1", 7.0))
        .toDF("k", "g", "v"), "k"))
    step(VersionedTable.deleteByKeys(spark, root,
      Seq(1L, 2L, 3L, 10L).toDF("k"), "k"))
    // a group can drain to zero and must drop out
    step(VersionedTable.deleteByKeys(spark, root,
      Seq(20L).toDF("k"), "k"))
    assert(!asSet(s).exists(_._1 == "moved"), "drained group must drop out")
  }

  test("persisted view: tagged refresh, replay refused, crash recoverable, multi-version catch-up") {
    val base = Files.createTempDirectory("graft-ivmp").toString
    val (root, viewRoot) = (s"$base/t", s"$base/view")
    VersionedTable.create(spark, root,
      (1L to 50L).map(k => (k, s"g${k % 5}", k * 1.5)).toDF("k", "g", "v"))
    assert(Ivm.materializeView(spark, viewRoot, root, Seq("g"), "v") === 1L)
    assert(Ivm.appliedVersion(spark, viewRoot) === Some(1L))
    assert(asSet(VersionedTable.read(spark, viewRoot)) === summaryOf(root))

    // one commit, one refresh
    VersionedTable.append(spark, root,
      (51L to 70L).map(k => (k, s"g${k % 5}", k * 1.5)).toDF("k", "g", "v"))
    assert(Ivm.refreshView(spark, viewRoot, root, "k", Seq("g"), "v"))
    assert(asSet(VersionedTable.read(spark, viewRoot)) === summaryOf(root))

    // replay at the same upstream version: refused, view untouched
    val viewV = VersionedTable.latestVersion(spark, viewRoot)
    assert(!Ivm.refreshView(spark, viewRoot, root, "k", Seq("g"), "v"))
    assert(VersionedTable.latestVersion(spark, viewRoot) === viewV)

    // crash window: two upstream commits land with NO refresh between
    // (a refresh crashing between feed-read and view-commit persists
    // nothing — the applied watermark still reads 2) …
    VersionedTable.merge(spark, root,
      Seq((10L, "moved", 999.25), (71L, "g1", 7.0)).toDF("k", "g", "v"), "k")
    VersionedTable.deleteByKeys(spark, root, Seq(1L, 2L, 20L).toDF("k"), "k")
    assert(Ivm.appliedVersion(spark, viewRoot) === Some(2L))
    // … and ONE catch-up refresh spans the multi-version feed exactly
    assert(Ivm.refreshView(spark, viewRoot, root, "k", Seq("g"), "v"))
    assert(Ivm.appliedVersion(spark, viewRoot) === Some(4L))
    assert(asSet(VersionedTable.read(spark, viewRoot)) === summaryOf(root))

    // an older-version refresh request is refused too (v <= applied)
    val vBefore = VersionedTable.latestVersion(spark, viewRoot)
    assert(!Ivm.refreshView(spark, viewRoot, root, "k", Seq("g"), "v",
      toVersion = Some(3L)))
    assert(VersionedTable.latestVersion(spark, viewRoot) === vBefore)
  }

  test("delta-join maintenance equals join recompute as both sides mutate") {
    val base = Files.createTempDirectory("graft-ivmj").toString
    val (dimRoot, factRoot) = (s"$base/dim", s"$base/fact")
    // dim: (dk, g); fact: (fk, dk, v) — view: per-g count/sum over dim ⋈ fact
    VersionedTable.create(spark, dimRoot,
      (1L to 10L).map(d => (d, s"g${d % 3}")).toDF("dk", "g"))
    VersionedTable.create(spark, factRoot,
      (1L to 40L).map(f => (f, f % 10 + 1, f * 0.25)).toDF("fk", "dk", "v"))
    def recompute = Ivm.summarize(
      VersionedTable.read(spark, factRoot)
        .join(VersionedTable.read(spark, dimRoot).withColumnRenamed("dk", "ddk"),
          col("dk") === col("ddk")),
      Seq("g"), "v")
    var s = recompute.localCheckpoint()

    def stepFact(commit: => Long): Unit = {
      val v = commit
      s = Ivm.applyJoinDelta(s,
        VersionedTable.changeFeedRows(spark, factRoot, v - 1, v, "fk"),
        VersionedTable.read(spark, dimRoot).withColumnRenamed("dk", "ddk"),
        "dk", "ddk", Seq("g"), "v").localCheckpoint()
      assert(asSet(s) === asSet(recompute),
        s"fact-side delta diverged from recompute at fact version $v")
    }
    stepFact(VersionedTable.append(spark, factRoot,
      (41L to 55L).map(f => (f, f % 10 + 1, f * 0.25)).toDF("fk", "dk", "v")))
    stepFact(VersionedTable.merge(spark, factRoot,
      Seq((5L, 3L, 100.5)).toDF("fk", "dk", "v"), "fk"))
    // dim-side GROUP MOVE: dk=3's facts must leave g0 and enter gX
    val vDim = VersionedTable.merge(spark, dimRoot,
      Seq((3L, "gX")).toDF("dk", "g"), "dk")
    s = Ivm.applyJoinDelta(s,
      VersionedTable.changeFeedRows(spark, dimRoot, vDim - 1, vDim, "dk"),
      VersionedTable.read(spark, factRoot).withColumnRenamed("dk", "fdk"),
      "dk", "fdk", Seq("g"), "v").localCheckpoint()
    assert(asSet(s) === asSet(recompute), "dim-side group move diverged")
    assert(asSet(s).exists(_._1 == "gX"))
    // dim DELETE retracts its facts from the inner-join view
    val vDel = VersionedTable.deleteByKeys(spark, dimRoot,
      Seq(7L).toDF("dk"), "dk")
    s = Ivm.applyJoinDelta(s,
      VersionedTable.changeFeedRows(spark, dimRoot, vDel - 1, vDel, "dk"),
      VersionedTable.read(spark, factRoot).withColumnRenamed("dk", "fdk"),
      "dk", "fdk", Seq("g"), "v").localCheckpoint()
    assert(asSet(s) === asSet(recompute), "dim delete retraction diverged")
  }

  test("streaming join-view maintenance: tagged fact ingest + delta-join fold, replay is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-ivmjs").toString
    val (dimRoot, factRoot) = (s"$base/dim", s"$base/fact")
    VersionedTable.create(spark, dimRoot,
      (1L to 10L).map(d => (d, s"g${d % 3}")).toDF("dk", "g"))
    VersionedTable.create(spark, factRoot,
      (1L to 20L).map(f => (f, f % 10 + 1, f * 0.5)).toDF("fk", "dk", "v"))
    var summary = Ivm.summarize(
      VersionedTable.read(spark, factRoot)
        .join(VersionedTable.read(spark, dimRoot).withColumnRenamed("dk", "ddk"),
          col("dk") === col("ddk")),
      Seq("g"), "v").localCheckpoint()
    // the maintenance loop a foreachBatch sink runs: idempotence-tagged
    // fact append; the view folds ONLY when the commit was fresh, so an
    // at-least-once replay of a committed batch changes nothing
    def processBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      if (VersionedTable.appendBatch(spark, factRoot, batch, s"batch-$id")) {
        val v = VersionedTable.latestVersion(spark, factRoot).get
        summary = Ivm.applyJoinDelta(summary,
          VersionedTable.changeFeedRows(spark, factRoot, v - 1, v, "fk"),
          VersionedTable.read(spark, dimRoot).withColumnRenamed("dk", "ddk"),
          "dk", "ddk", Seq("g"), "v").localCheckpoint()
      }
    val source = MemoryStream[(Long, Long, Double)]
    val q = source.toDS().toDF("fk", "dk", "v").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ivmjs-ck").toString)
      .foreachBatch(processBatch _)
      .start()
    try {
      source.addData((21L to 30L).map(f => (f, f % 10 + 1, f * 0.5)))
      q.processAllAvailable()
      source.addData((31L to 35L).map(f => (f, f % 10 + 1, f * 0.5)))
      q.processAllAvailable()
    } finally q.stop()
    val before = asSet(summary)
    processBatch((99L to 99L).map(f => (f, 1L, 1.0)).toDF("fk", "dk", "v"), 1L)
    assert(asSet(summary) === before, "replayed batch must not re-fold")
    val recompute = Ivm.summarize(
      VersionedTable.read(spark, factRoot)
        .join(VersionedTable.read(spark, dimRoot).withColumnRenamed("dk", "ddk"),
          col("dk") === col("ddk")),
      Seq("g"), "v")
    assert(asSet(summary) === asSet(recompute),
      "streamed view must equal the batch recompute over all ingested facts")
  }

  test("changeFeedRows prunes to entered/left files and tags changes") {
    val root = tmp()
    VersionedTable.create(spark, root,
      spark.range(0, 100, 2).select(col("id").as("k"), lit("a").as("g"),
        (col("id") * 1.0).as("v")).coalesce(1), bloomKeys = Seq("k"))
    VersionedTable.append(spark, root,
      spark.range(1, 100, 2).select(col("id").as("k"), lit("b").as("g"),
        (col("id") * 1.0).as("v")).coalesce(1))
    // targeted merge: touches only the evens file (bloom-pruned)
    val v = VersionedTable.merge(spark, root,
      Seq((4L, "a", -4.0)).toDF("k", "g", "v"), "k")
    val feed = VersionedTable.changeFeedRows(spark, root, v - 1, v, "k")
      .select("key", "change").as[(Long, String)].collect().toMap
    assert(feed === Map(4L -> "changed"),
      "compaction-identical rows of the rewritten file must not appear")
    // append-only feed: all added
    val v2 = VersionedTable.append(spark, root,
      Seq((200L, "c", 1.0)).toDF("k", "g", "v"))
    val feed2 = VersionedTable.changeFeedRows(spark, root, v2 - 1, v2, "k")
      .select("key", "change").as[(Long, String)].collect().toMap
    assert(feed2 === Map(200L -> "added"))
  }
}
