package graft.plans

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def truncated(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().forall(_.isInstanceOf[LogicalRDD]) &&
      df.queryExecution.optimizedPlan.isInstanceOf[LogicalRDD]

  test("cut truncates lineage in local mode (default)") {
    val df = spark.range(100).toDF("id").filter($"id" % 2 === 0)
    val cut = Lineage.cut(df)
    assert(truncated(cut), cut.queryExecution.optimizedPlan.toString)
    assert(cut.count() === 50)
  }

  test("cut truncates lineage in reliable mode and writes checkpoint files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.conf.set(Lineage.ReliableKey, "true")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      val df = spark.range(100).toDF("id").filter($"id" % 2 === 0)
      val cut = Lineage.cut(df)
      assert(truncated(cut), cut.queryExecution.optimizedPlan.toString)
      assert(cut.count() === 50)
      // the cut must be RELIABLE: blocks on the fault-tolerant FS, not in
      // executor storage — that's the whole point of the mode
      val files = java.nio.file.Files.walk(dir).filter(
        java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.set(Lineage.ReliableKey, "false")
      spark.conf.unset(Lineage.DirKey)
    }
  }

  test("iterative ops produce identical results in both checkpoint modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val local = graft.analytics.Graph.pageRank(edges, iters = 3)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2")
    spark.conf.set(Lineage.ReliableKey, "true")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      val reliable = graft.analytics.Graph.pageRank(edges, iters = 3)
        .orderBy("node").as[(Long, Double)].collect().toSeq
      assert(reliable === local)
    } finally {
      spark.conf.set(Lineage.ReliableKey, "false")
      spark.conf.unset(Lineage.DirKey)
    }
  }

  test("round-5 iterative ops (kCore, bfsLevels) match across checkpoint modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val srcs = Seq(1L).toDF("id")
    val localCore = graft.analytics.Graph.kCore(edges, 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val localBfs = graft.analytics.Graph.bfsLevels(edges, srcs)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt3")
    spark.conf.set(Lineage.ReliableKey, "true")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      assert(graft.analytics.Graph.kCore(edges, 2)
        .orderBy("node").as[(Long, Long)].collect().toSeq === localCore)
      assert(graft.analytics.Graph.bfsLevels(edges, srcs)
        .orderBy("node").as[(Long, Long)].collect().toSeq === localBfs)
    } finally {
      spark.conf.set(Lineage.ReliableKey, "false")
      spark.conf.unset(Lineage.DirKey)
    }
  }
}
