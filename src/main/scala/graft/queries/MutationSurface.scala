package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Mutations
import graft.store.DerivedItems

/** Driver-facing bundle of the mutation surface (M1-M10): each verb applied
  * to the derived item table, result exploded to rows, oracle-checked
  * against the equivalent CASE-rewrite in DuckDB.
  */
object MutationSurface {

  private def flat(s: SparkSession, d: String) = DerivedItems.items(s, d)
  private def nested(s: SparkSession, d: String) = DerivedItems.nestedItems(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M7: bulk reset of locked items back to todo
    "pa_mut_reset_locked" -> ((s, d) =>
      Mutations.resetItems(flat(s, d), col("itemState") === "locked")
        .select(col("itemID"), col("itemState"), col("lockID"), col("instanceID"),
          col("lockDate"), col("doneDate"), col("errorDate"), col("logLength"))
        .orderBy("itemID")),
    // M8: bulk state flip by id predicate
    "pa_mut_update_states" -> ((s, d) =>
      Mutations.updateItemStates(flat(s, d),
        col("itemID").endsWith("00"), "locked")
        .select(col("itemID"), col("itemState"))
        .orderBy("itemID")),
    // M9 (via M7 resetTasks): Wall_Time_Exceeded items fully re-queued
    "pa_mut_nested_reset" -> ((s, d) =>
      Mutations.explodeTasks(
        Mutations.resetItems(nested(s, d),
          col("itemState") === "Wall_Time_Exceeded", resetTasks = true))
        .orderBy("itemID", "taskKey")),
    // M3: drop Task_0/Task_2 from items whose id ends in 5
    "pa_mut_delete_tasks" -> ((s, d) =>
      Mutations.explodeTasks(
        Mutations.deleteNestedTasks(nested(s, d),
          col("itemID").endsWith("5"), Seq("Task_0", "Task_2")))
        .select("itemID", "taskKey", "status", "script")
        .orderBy("itemID", "taskKey")),
    // M4: record a finished Task_1 on every locked item still holding it
    "pa_mut_record_result" -> ((s, d) =>
      Mutations.explodeTasks(
        Mutations.recordTaskResult(nested(s, d), col("itemState") === "locked",
          "Task_1", lit("1\n2\n3"), lit("")))
        .orderBy("itemID", "taskKey")),
    // M10 + A1: delete a task group, recount states
    "pa_mut_delete_items" -> ((s, d) =>
      StateQueries.itemCounter(
        Mutations.deleteItems(flat(s, d), col("taskID") === "grp_7"))),
    // M5: task-key listing
    "pa_mut_task_keys" -> ((s, d) =>
      Mutations.listTaskKeys(nested(s, d)).orderBy("itemID", "taskKey")),
    // SCD2 merge (absent in the reference — its updates destroy history):
    // changed segments close + re-version, no-op re-deliveries stay put,
    // new keys insert
    "pa_scd2_merge" -> ((s, d) =>
      scd2GateDim(s, d).orderBy("c_custkey", "valid_from")),
    // point-in-time join: even orders look the dimension up BEFORE the
    // change batch's effective time, odd orders after — each side must see
    // its own version
    "pa_scd2_pit" -> ((s, d) => {
      val facts = graft.Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"),
        when(col("o_orderkey") % 2 === 0, lit(500000L))
          .otherwise(lit(1500000L)).as("ts_us"))
      graft.ops.Scd2.pointInTime(facts, "o_custkey", "ts_us",
          scd2GateDim(s, d), "c_custkey")
        .orderBy("o_orderkey")
    }),
  )

  /** The SCD2 gate dimension: customers seeded at t=0, one deterministic
    * change batch merged at t=1e6 (segment moves, no-op re-deliveries,
    * and brand-new keys).
    */
  private def scd2GateDim(s: SparkSession, d: String) = {
    // c_nationkey emits as BIGINT, not the parquet's int32: int32 is a
    // driver-risk output type (see tools/check_oracle.py)
    val cust = graft.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("long")
        .as("c_nationkey"), col("c_mktsegment"))
    val changes = cust.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName(cust.filter(col("c_custkey") % 7 === 1))
      .unionByName(cust.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          lit(99L).as("c_nationkey"),
          lit("NEW").as("c_mktsegment")))
      .withColumn("eff_us", lit(graft.ops.Scd2.GateEffUs))
    graft.ops.Scd2.merge(graft.ops.Scd2.seed(cust), changes,
      "c_custkey", Seq("c_nationkey", "c_mktsegment"))
  }

  private val items = DerivedItems.itemsCte
  private val ntasksSel = DerivedItems.nestedTaskRowsCte.replaceFirst("^WITH ", ", ")

  val oracles: Map[String, String] = Map(
    "pa_mut_reset_locked" -> (items +
      """
        |SELECT itemID,
        |  CASE WHEN itemState = 'locked' THEN 'todo' ELSE itemState END AS itemState,
        |  CASE WHEN itemState = 'locked' THEN NULL ELSE lockID END AS lockID,
        |  CASE WHEN itemState = 'locked' THEN NULL ELSE instanceID END AS instanceID,
        |  CASE WHEN itemState = 'locked' THEN NULL ELSE lockDate END AS lockDate,
        |  CASE WHEN itemState = 'locked' THEN NULL ELSE doneDate END AS doneDate,
        |  CASE WHEN itemState = 'locked' THEN FALSE ELSE errorDate END AS errorDate,
        |  CASE WHEN itemState = 'locked' THEN 0 ELSE logLength END AS logLength
        |FROM items ORDER BY itemID""".stripMargin),
    "pa_mut_update_states" -> (items +
      """
        |SELECT itemID,
        |  CASE WHEN itemID LIKE '%00' THEN 'locked' ELSE itemState END AS itemState
        |FROM items ORDER BY itemID""".stripMargin),
    "pa_mut_nested_reset" -> (items + ntasksSel +
      """
        |SELECT t.itemID, t.taskKey,
        |  CASE WHEN i.itemState = 'Wall_Time_Exceeded' THEN 'todo' ELSE t.status END AS status,
        |  t.script,
        |  CASE WHEN i.itemState = 'Wall_Time_Exceeded' THEN 0 ELSE i.logLength END AS logLength
        |FROM ntasks t JOIN items i USING (itemID)
        |ORDER BY itemID, taskKey""".stripMargin),
    "pa_mut_delete_tasks" -> (items + ntasksSel +
      """
        |SELECT itemID, taskKey, status, script FROM ntasks
        |WHERE NOT (itemID LIKE '%5' AND taskKey IN ('Task_0', 'Task_2'))
        |ORDER BY itemID, taskKey""".stripMargin),
    "pa_mut_record_result" -> (items + ntasksSel +
      """
        |, hit AS (
        |  SELECT t.itemID FROM ntasks t JOIN items i USING (itemID)
        |  WHERE i.itemState = 'locked' AND t.taskKey = 'Task_1' AND t.status = 'todo'
        |)
        |SELECT t.itemID, t.taskKey,
        |  CASE WHEN t.itemID IN (SELECT itemID FROM hit) AND t.taskKey = 'Task_1'
        |       THEN 'done' ELSE t.status END AS status,
        |  t.script,
        |  i.logLength + CASE WHEN t.itemID IN (SELECT itemID FROM hit) THEN 1 ELSE 0 END AS logLength
        |FROM ntasks t JOIN items i USING (itemID)
        |ORDER BY itemID, taskKey""".stripMargin),
    "pa_mut_delete_items" -> (items +
      """
        |SELECT itemState, COUNT(*) AS n, COUNT(nestedTaskCount) AS n_nested,
        |       MIN(itemID) AS min_item, MAX(itemID) AS max_item
        |FROM items WHERE taskID <> 'grp_7'
        |GROUP BY itemState ORDER BY itemState""".stripMargin),
    "pa_mut_task_keys" -> (items + ntasksSel +
      """
        |SELECT itemID, taskKey FROM ntasks ORDER BY itemID, taskKey""".stripMargin),
    "pa_scd2_merge" ->
      (scd2DimCtes + "\nSELECT * FROM dim ORDER BY c_custkey, valid_from"),
    "pa_scd2_pit" -> (scd2DimCtes +
      """,
        |facts AS (SELECT o_orderkey, o_custkey,
        |  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 500000 ELSE 1500000 END AS BIGINT) AS ts_us
        |  FROM orders)
        |SELECT f.o_orderkey, f.o_custkey, f.ts_us, d.c_nationkey, d.c_mktsegment
        |FROM facts f LEFT JOIN dim d ON f.o_custkey = d.c_custkey
        |  AND d.valid_from <= f.ts_us
        |  AND (d.valid_to IS NULL OR f.ts_us < d.valid_to)
        |ORDER BY o_orderkey""".stripMargin),
  )

  private def scd2DimCtes: String =
      """WITH cust AS (SELECT c_custkey,
        |    CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment
        |  FROM customer),
        |chg AS (
        |  SELECT c_custkey, c_nationkey, 'MOVED' AS c_mktsegment, 1000000 AS eff_us
        |  FROM cust WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, c_mktsegment, 1000000
        |  FROM cust WHERE c_custkey % 7 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, CAST(99 AS BIGINT), 'NEW', 1000000
        |  FROM cust WHERE c_custkey % 13 = 0
        |),
        |old_rows AS (
        |  SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
        |    CAST(0 AS BIGINT) AS valid_from,
        |    CASE WHEN g.c_custkey IS NOT NULL
        |              AND (g.c_nationkey IS DISTINCT FROM c.c_nationkey
        |                   OR g.c_mktsegment IS DISTINCT FROM c.c_mktsegment)
        |         THEN CAST(g.eff_us AS BIGINT) END AS valid_to,
        |    NOT (g.c_custkey IS NOT NULL
        |         AND (g.c_nationkey IS DISTINCT FROM c.c_nationkey
        |              OR g.c_mktsegment IS DISTINCT FROM c.c_mktsegment)) AS is_current
        |  FROM cust c LEFT JOIN chg g ON c.c_custkey = g.c_custkey
        |),
        |new_rows AS (
        |  SELECT g.c_custkey, g.c_nationkey, g.c_mktsegment,
        |    CAST(g.eff_us AS BIGINT) AS valid_from,
        |    CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
        |  FROM chg g LEFT JOIN cust c ON g.c_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL
        |     OR g.c_nationkey IS DISTINCT FROM c.c_nationkey
        |     OR g.c_mktsegment IS DISTINCT FROM c.c_mktsegment
        |),
        |dim AS (SELECT * FROM old_rows UNION ALL SELECT * FROM new_rows)""".stripMargin
}
