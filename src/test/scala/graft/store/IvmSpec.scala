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
