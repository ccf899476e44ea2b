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

  test("cutCounted truncates lineage, counts correctly, and blocks are reusable") {
    val df = spark.range(100).toDF("id").filter($"id" % 2 === 0)
    val (cut, n) = Lineage.cutCounted(df)
    assert(n === 50L)
    assert(truncated(cut), cut.queryExecution.optimizedPlan.toString)
    assert(cut.count() === 50L)
    cut.unpersist()
  }

  test("cutCounted costs ONE Spark job where eager cut + count costs two") {
    // the r5 verdict's carried perf note: kCore/bfsLevels paid two stage
    // waves per round (eager checkpoint materialization, then a count over
    // the blocks). cutCounted makes the count the materializing action.
    // AQE off for a deterministic job count; a no-shuffle plan so the
    // count is a single job in both shapes.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def settle(): Int = {
      // listener delivery is async: poll until the count is stable
      var prev = -1
      var cur = jobs.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = jobs.get(); spins += 1
      }
      cur
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = spark.range(1000).toDF("id").filter($"id" % 3 === 0)
      df.rdd.count() // warm anything lazy before measuring
      settle(); jobs.set(0)
      val (fusedDf, _) = Lineage.cutCounted(df)
      val fused = settle()
      fusedDf.unpersist()
      settle(); jobs.set(0)
      val eager = Lineage.cut(df)
      eager.count()
      val unfused = settle()
      eager.unpersist()
      assert(fused === 1, s"fused cut+count ran $fused jobs, want 1")
      assert(unfused === 2, s"eager cut then count ran $unfused jobs, want 2")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("RoundLog is silent by default and emits per-round lines when enabled") {
    def capture(body: => Unit): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos))(body)
      bos.toString("UTF-8")
    }
    // default: disabled, no output
    val silent = capture {
      val log = RoundLog.timer(spark, "testop")
      log(0, "info"); log(1, "more")
    }
    assert(silent.isEmpty)
    // enabled via conf: one line per round with the op and round index
    spark.conf.set(RoundLog.Key, "true")
    try {
      val loud = capture {
        val log = RoundLog.timer(spark, "testop")
        log(0, "edges=5"); log(1, "edges=3")
      }
      val lines = loud.trim.split("\n").toSeq
      assert(lines.length === 2)
      assert(lines.head.contains("op=testop") && lines.head.contains("round=0")
        && lines.head.contains("edges=5"))
      assert(lines(1).contains("round=1") && lines(1).contains("round_sec="))
    } finally spark.conf.unset(RoundLog.Key)
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
