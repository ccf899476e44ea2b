package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.store.DerivedItems

/** Driver-facing bundle for the execution/monitoring surface: the
  * SQL-expressible parts of the executor path (claim semantics, A8 rolling
  * forecast, T5 monitor snapshot). The process-forking parts (S12/X1-X5)
  * are exercised in ScalaTest (they execute real subprocesses — not a
  * DuckDB-checkable shape).
  */
object ExecutionSurface {

  /** Deterministic claim marking: todo → locked with a content-derived lock
    * token. The reference's optimistic lock writes a *random* 30-char token
    * then read-verifies (`code/modifier.py:36-125`); under driver-assigned
    * partitions the claim is exactly-once, so the token is only attribution
    * — derived (md5) instead of random so runs are reproducible.
    */
  def claimTodo(items: DataFrame, instanceID: String, now: org.apache.spark.sql.Column): DataFrame =
    items
      .withColumn("__p", col("itemState") === "todo")
      .withColumn("itemState", when(col("__p"), "locked").otherwise(col("itemState")))
      .withColumn("lockID", when(col("__p"), md5(col("itemID"))).otherwise(col("lockID")))
      .withColumn("instanceID", when(col("__p"), instanceID).otherwise(col("instanceID")))
      .withColumn("lockDate", when(col("__p"), now).otherwise(col("lockDate")))
      .drop("__p")

  /** A8: rolling mean of the last ≤15 task durations + the TimeKeeper
    * forecast (`Next_Elapse = wall + avg`, `code/timeKeeper.py:50-73`),
    * as an analytic window over the events stream (`value` = duration).
    * Decimal-exact sums keep the oracle bit-identical.
    */
  def rollingElapsed(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val recent = w.rowsBetween(-14, 0)
    val all = w.rowsBetween(Window.unboundedPreceding, 0)
    val dec = col("value").cast("decimal(18,4)")
    events.filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        (sum(dec).over(recent).cast("double") / count(lit(1)).over(recent)).as("avg_recent"),
        (sum(dec).over(all).cast("double") +
          sum(dec).over(recent).cast("double") / count(lit(1)).over(recent)).as("next_elapse"))
      .orderBy(col("event_id"))
  }

  /** T5/A2 monitor snapshot: tumbling 1-hour windows × event_type counts and
    * decimal-exact totals — the batch shape of the Structured Streaming
    * monitor (`graft.streaming`); the reference polls this in a sleep loop
    * (`code/manager.py:209-244`).
    */
  def monitorWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
      .orderBy(col("window_start"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pa_claim_todo" -> ((s, d) =>
      claimTodo(DerivedItems.items(s, d), "spark-exec-1",
        to_timestamp(lit("2026-01-02 03:04:05")))
        .select(col("itemID"), col("itemState"), col("lockID"), col("instanceID"),
          col("lockDate"))
        .orderBy("itemID")),
    "pa_rolling_elapsed" -> ((s, d) => rollingElapsed(Tables.events(s, d))),
    "pa_monitor_windows" -> ((s, d) => monitorWindows(Tables.events(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "pa_claim_todo" -> (DerivedItems.itemsCte +
      """
        |SELECT itemID,
        |  CASE WHEN itemState = 'todo' THEN 'locked' ELSE itemState END AS itemState,
        |  CASE WHEN itemState = 'todo' THEN md5(itemID) ELSE lockID END AS lockID,
        |  CASE WHEN itemState = 'todo' THEN 'spark-exec-1' ELSE instanceID END AS instanceID,
        |  CASE WHEN itemState = 'todo' THEN TIMESTAMP '2026-01-02 03:04:05' ELSE lockDate END AS lockDate
        |FROM items ORDER BY itemID""".stripMargin),
    "pa_rolling_elapsed" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER recent AS VARCHAR) AS DOUBLE)
        |    / COUNT(*) OVER recent AS avg_recent,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER cum AS VARCHAR) AS DOUBLE)
        |    + CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER recent AS VARCHAR) AS DOUBLE)
        |      / COUNT(*) OVER recent AS next_elapse
        |FROM events WHERE event_type = 'purchase'
        |WINDOW recent AS (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
        |       cum AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "pa_monitor_windows" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )
}
