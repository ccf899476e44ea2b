package graft.exec

import scala.collection.mutable

/** T4/A8 wall-time budgeting (reference `code/timeKeeper.py`).
  *
  * The reference gives each worker a `-w` seconds budget and stops claiming
  * when either the wall time is spent, or the *forecast* — wall + rolling
  * mean of the last ≤15 task durations — would overrun
  * (`code/timeKeeper.py:50-73`). Same semantics here, applied per executor
  * partition inside [[ScriptRunner]]: a partition that runs out of budget
  * stops launching processes and reports its remaining tasks as
  * `Wall_Time_Exceeded` (the reference's partial-completion state), which the
  * merge step then persists so a re-run resumes exactly there (skip-done
  * replay, `code/runner.py:101-105`).
  *
  * Pure Scala (no Spark deps) so the budget math is unit-testable; the
  * `nanoTime` clock is injectable for determinism in tests.
  */
final class TimeKeeper(
    limitSeconds: Double,
    windowSize: Int = TimeKeeper.DefaultWindow,
    clock: () => Long = System.nanoTime) {

  private val start = clock()
  private val recent = mutable.Queue.empty[Double]

  /** Seconds since construction (reference `wall`). */
  def wallSeconds: Double = (clock() - start) / 1e9

  /** Record one finished task's duration (reference appends then trims to
    * the last 15 — `timeKeeper.py:50-58`).
    */
  def record(elapsedSeconds: Double): Unit = {
    recent.enqueue(elapsedSeconds)
    while (recent.size > windowSize) { recent.dequeue(); () }
  }

  /** Rolling mean of the last ≤window durations (A8); 0 when empty. */
  def avgRecentSeconds: Double =
    if (recent.isEmpty) 0.0 else recent.sum / recent.size

  /** Forecast of where the wall will be after one more average task
    * (`Next_Elapse = wall + avg` — `timeKeeper.py:61-73`).
    */
  def forecastSeconds: Double = wallSeconds + avgRecentSeconds

  /** Stop claiming? (`wall > limit or wall + avg > limit`). */
  def shouldStop: Boolean =
    wallSeconds > limitSeconds || forecastSeconds > limitSeconds
}

object TimeKeeper {
  val DefaultWindow = 15 // timeKeeper.py:53
}
