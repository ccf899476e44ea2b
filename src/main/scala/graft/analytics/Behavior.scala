package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ordered-funnel and cohort-retention analysis over the events stream —
  * the two user-behavior reports every event-analytics engine ships
  * (the reference's monitor surface, `/root/reference/code/monitor.py`,
  * counts states but never sequences them).
  *
  * Both operators do ALL time arithmetic in epoch-microsecond longs
  * (`unix_micros`) or integer day/week indexes — never doubles, never
  * calendar functions whose week-start convention could differ between
  * engines — so results are bit-identical in any engine and independent of
  * partitioning.
  *
  * Scale shape: each operator is ONE shuffle on `user_id` (every window and
  * groupBy below is keyed by user first; Catalyst reuses the exchange), then
  * a tiny final aggregate over stage/cohort keys. Per-user state is O(steps)
  * or O(weeks-active) — nothing unbounded, no driver-side loops.
  */
object Behavior {

  /** Funnel window used by the gate: the synthetic 30-day event stream has
    * ~7 h median inter-event gaps per user, so a 7-day conversion window
    * exercises both the in-window and the timed-out branch.
    */
  val GateWindowMicros: Long = 7L * 24 * 60 * 60 * 1000 * 1000

  val GateSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered conversion funnel: a user completes step i at the EARLIEST
    * event of `steps(i)` that is strictly after their step i-1 completion
    * and within `windowMicros` of their step 0 completion (the funnel entry
    * clock starts at step 0). Returns one row per stage:
    * (stage_idx, stage, users, conv_rate) where conv_rate = users /
    * stage-0 users (division of two exact longs).
    *
    * Plan: the per-step "earliest qualifying event" columns are chained
    * unbounded windows over the SAME `partitionBy(user_id)` — one exchange,
    * N Window nodes, no sort needed (frames are whole-partition min); the
    * stage roll-up then aggregates ~steps rows. At 100 TB this is a scan +
    * one user-keyed shuffle, identical to sessionization.
    */
  /** Per-user step completion times: one row per user, columns t0..t_{n-1}
    * (null where the user never completed the step). t0 = earliest step-0
    * event; t_i = earliest step-i event after t_{i-1} and within the
    * window that started at t0. Exposed so the streaming twin can assert
    * exact parity against the batch semantics.
    */
  def userStepTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String] = GateSteps,
      windowMicros: Long = GateWindowMicros): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    val base = events.select(
      col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("us"),
      col(typeCol).as("etype"))

    val withSteps = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, 0)) =>
        df.withColumn("t0", min(when(col("etype") === step, col("us"))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"t$i",
          min(when(col("etype") === step &&
            col("us") > col(s"t${i - 1}") &&
            col("us") <= col("t0") + windowMicros, col("us"))).over(w))
    }

    withSteps
      .groupBy("user_id")
      .agg(steps.indices.map(i => first(s"t$i").as(s"t$i")).head,
        steps.indices.map(i => first(s"t$i").as(s"t$i")).tail: _*)
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String] = GateSteps,
      windowMicros: Long = GateWindowMicros): DataFrame = {
    val perUser = userStepTimes(events, userCol, tsCol, typeCol, steps,
      windowMicros)

    // one row per stage; users(i) = users whose t_i is set
    val stageCounts = perUser.select(
      steps.indices.map(i =>
        count(col(s"t$i")).as(s"u$i")): _*)

    // stage_idx emits as BIGINT: int32 is a driver-risk output type (the
    // gate hash is width-sensitive — see tools/check_oracle.py)
    val stages = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(step).as("stage"),
        col(s"u$i").as("users"))
    }
    stageCounts
      .select(explode(array(stages: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.users"))
      .withColumn("conv_rate",
        col("users").cast("double") /
          first("users").over(Window.orderBy("stage_idx")
            .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Monday-aligned week index of an epoch-microseconds column, in pure
    * integer arithmetic: day = us div 86_400_000_000 (all testdata is
    * post-epoch); 1970-01-01 was a Thursday, so day+3 shifts the week
    * boundary to Monday and div 7 numbers the weeks.
    */
  private def weekIdxExpr(usCol: String): org.apache.spark.sql.Column =
    expr(s"(($usCol div 86400000000) + 3) div 7")

  /** Cohort retention: users are cohorted by the week of their FIRST
    * `cohortEvent` (signup); retention counts distinct users of each cohort
    * active (any event) in each later week. Output:
    * (cohort_wk, week_offset, users) with week indexes as exact integers
    * (see [[weekIdxExpr]]); offset 0 is the signup week itself.
    *
    * Plan: both the first-signup aggregate and the distinct (user, week)
    * activity set shuffle on user_id; the join is co-partitioned, and only
    * the tiny (cohort, offset) roll-up shuffles again. No calendar
    * functions: the week index arithmetic is identical in any engine.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, cohortEvent: String = "signup"): DataFrame = {
    val e = events.select(
      col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("us"),
      col(typeCol).as("etype"))
      .withColumn("wk", weekIdxExpr("us"))

    val cohorts = e.filter(col("etype") === cohortEvent)
      .groupBy("user_id").agg(min("wk").as("cohort_wk"))

    val active = e.select("user_id", "wk").distinct()

    active.join(cohorts, "user_id")
      .filter(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_funnel" -> ((s, d) =>
      funnel(Tables.events(s, d), "user_id", "ts", "event_type")
        .orderBy("stage_idx")),
    "evt_cohorts" -> ((s, d) =>
      cohortRetention(Tables.events(s, d), "user_id", "ts", "event_type")
        .orderBy("cohort_wk", "week_offset")))

  /** DuckDB twins. The funnel's chained window-min columns become chained
    * per-user aggregates joined back to the event stream; the week index is
    * the same `(day + 3) div 7` integer arithmetic.
    */
  val oracles: Map[String, String] = Map(
    "evt_funnel" -> s"""
      |WITH e AS (SELECT user_id, event_type AS etype, epoch_us(ts) AS us FROM events),
      |u0 AS (SELECT user_id, MIN(CASE WHEN etype = 'view' THEN us END) AS t0
      |       FROM e GROUP BY user_id),
      |u1 AS (SELECT e.user_id, MIN(e.us) AS t1
      |       FROM e JOIN u0 USING (user_id)
      |       WHERE e.etype = 'click' AND e.us > u0.t0
      |         AND e.us <= u0.t0 + ${GateWindowMicros}
      |       GROUP BY e.user_id),
      |u2 AS (SELECT e.user_id, MIN(e.us) AS t2
      |       FROM e JOIN u0 USING (user_id) JOIN u1 USING (user_id)
      |       WHERE e.etype = 'purchase' AND e.us > u1.t1
      |         AND e.us <= u0.t0 + ${GateWindowMicros}
      |       GROUP BY e.user_id),
      |c AS (SELECT
      |        (SELECT COUNT(t0) FROM u0) AS c0,
      |        (SELECT COUNT(t1) FROM u1) AS c1,
      |        (SELECT COUNT(t2) FROM u2) AS c2)
      |SELECT stage_idx, stage, users,
      |  CAST(users AS DOUBLE) / (SELECT c0 FROM c) AS conv_rate
      |FROM (
      |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, c0 AS users FROM c
      |  UNION ALL SELECT 1, 'click', c1 FROM c
      |  UNION ALL SELECT 2, 'purchase', c2 FROM c)
      |ORDER BY stage_idx""".stripMargin,
    "evt_cohorts" -> """
      |WITH e AS (SELECT user_id, event_type AS etype,
      |             ((epoch_us(ts) // 86400000000) + 3) // 7 AS wk
      |           FROM events),
      |cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk
      |            FROM e WHERE etype = 'signup' GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT cohort_wk, wk - cohort_wk AS week_offset,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
      |FROM active JOIN cohorts USING (user_id)
      |WHERE wk >= cohort_wk
      |GROUP BY cohort_wk, week_offset
      |ORDER BY cohort_wk, week_offset""".stripMargin)
}
