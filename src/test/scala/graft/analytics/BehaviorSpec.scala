package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex
      .map { case ((u, sec, t), i) => (u, sec, t, i.toLong) }
      .toDF("user_id", "sec", "event_type", "event_id")
      .select($"user_id", timestamp_micros($"sec" * 1000000L).as("ts"),
        $"event_type", $"event_id")

  test("funnel requires steps strictly in order and inside the entry window") {
    val W = 100L // seconds, window = 100s
    val events = ev(Seq(
      // user 1: full funnel in order
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: click BEFORE the first view → stops at view
      (2L, 10L, "click"), (2L, 20L, "view"),
      // user 3: purchase before click → stops at click
      (3L, 0L, "view"), (3L, 5L, "purchase"), (3L, 10L, "click"),
      // user 4: converts but outside the window → stops at click
      (4L, 0L, "view"), (4L, 50L, "click"), (4L, 200L, "purchase"),
      // user 5: no view at all → not in the funnel
      (5L, 0L, "purchase")))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMicros = W * 1000000L)
      .orderBy("stage_idx")
      .as[(Long, String, Long, Double)].collect()
    assert(out.map(r => (r._2, r._3)).toSeq ===
      Seq(("view", 4L), ("click", 3L), ("purchase", 1L)))
    assert(out.map(_._4).toSeq === Seq(1.0, 0.75, 0.25))
  }

  test("funnel window is anchored at step 0, not at the previous step") {
    // click at 90s (inside), purchase at 150s — only 60s after the click
    // but 150s after the view: outside the 100s entry window
    val events = ev(Seq(
      (1L, 0L, "view"), (1L, 90L, "click"), (1L, 150L, "purchase")))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMicros = 100L * 1000000L)
      .orderBy("stage_idx").as[(Long, String, Long, Double)].collect()
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 0L))
  }

  test("cohort retention counts distinct active users per week offset") {
    val wk = 7L * 86400 // seconds per week; week boundary is Monday-aligned
    // day 4 (1970-01-05) is the first Monday — build weeks from there
    val mon = 4L * 86400
    val events = ev(Seq(
      // user 1 signs up week 0, active weeks 0,1,3
      (1L, mon, "signup"), (1L, mon + wk, "view"), (1L, mon + 3 * wk, "click"),
      // user 2 signs up week 0, active week 0 only
      (2L, mon + 86400, "signup"),
      // user 3 signs up week 1, active weeks 1,2
      (3L, mon + wk, "signup"), (3L, mon + 2 * wk + 3600, "view"),
      // user 4 never signs up → excluded entirely
      (4L, mon, "view")))
    val out = Behavior.cohortRetention(events, "user_id", "ts", "event_type")
      .orderBy("cohort_wk", "week_offset")
      .as[(Long, Long, Long)].collect()
    val byKey = out.map(r => (r._1 - out.head._1, r._2) -> r._3).toMap
    assert(byKey === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("cohort week index is Monday-aligned integer arithmetic") {
    // Sunday 1970-01-04 23:59:59 and Monday 1970-01-05 00:00:00 must land
    // in different weeks
    val events = ev(Seq(
      (1L, 4L * 86400 - 1, "signup"),
      (2L, 4L * 86400, "signup")))
    val out = Behavior.cohortRetention(events, "user_id", "ts", "event_type")
      .select("cohort_wk").distinct().as[Long].collect().sorted
    assert(out.length === 2 && out(1) === out(0) + 1)
  }

  test("funnel plan shuffles once: all step windows share the user partitioning") {
    val events = graft.Tables.events(spark, sf0001)
    val plan = Behavior.funnel(events, "user_id", "ts", "event_type")
      .queryExecution.executedPlan.toString
    // one exchange for the per-user windows + the single-row stage rollup;
    // the N chained window mins must NOT add one exchange per step
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges:\n$plan")
  }

  test("funnel stage counts are non-increasing on real event data") {
    val out = Behavior.funnel(graft.Tables.events(spark, sf0001),
        "user_id", "ts", "event_type")
      .orderBy("stage_idx")
      .as[(Long, String, Long, Double)].collect()
    assert(out.length === 3 && out.head._3 > 0)
    assert(out.sliding(2).forall(w => w(0)._3 >= w(1)._3),
      "a later stage can never have more users than an earlier one")
  }
}
