package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic work-item table derived from the driver testdata
  * (orders × lineitem), used to oracle-check every reference-surface
  * operator: the driver's DuckDB gate can only see the sfDir parquet tables,
  * so the item store is *derived* — identically in Spark (here) and in SQL
  * ([[itemsCte]]) — rather than imported from fixture files.
  *
  * Mapping: one order = one work item; its lineitems = the nested task map
  * (reference `TaskScript` map shape, `code/manager.py:326-349`). States
  * come from `o_orderstatus` (F→done, P→locked, O→todo) with every 53rd
  * order Wall_Time_Exceeded; every order with `o_orderkey % 3 == 0` is a
  * single-task item (the reference's string-typed `TaskScript` shape).
  * Task status: done items have all tasks done; locked/WTE items have
  * exactly the `l_returnflag = 'R'` tasks done (partial completion);
  * todo items none — so `logLength == count(done tasks)` holds by
  * construction, the invariant `code/modifier.py:240-249` maintains with
  * its atomic ADD counter.
  */
object DerivedItems {

  /** Flat item columns (no maps) — the shape most queries consume. */
  def items(spark: SparkSession, sfDir: String): DataFrame =
    itemsKeyed(spark, sfDir).drop("__okey")

  /** [[items]] plus the internal `__okey` (= `o_orderkey`) join column, so
    * downstream builds can join/aggregate on the numeric key the exchanges
    * are already partitioned on instead of re-shuffling on the derived
    * `itemID` string.
    */
  private def itemsKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    // one shuffle (groupBy l_orderkey), then a broadcast-free join on the
    // same key; at scale both sides are huge but co-partitioned by the join
    // key, so AQE plans a single exchange each.
    val nt = li.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("n_tasks"),
      count(when(col("l_returnflag") === "R", 1)).as("n_r_tasks"))
    val j = o.join(nt, o("o_orderkey") === nt("l_orderkey"), "left")
    val state = when(col("o_orderkey") % 53 === 0, "Wall_Time_Exceeded")
      .when(col("o_orderstatus") === "F", "done")
      .when(col("o_orderstatus") === "P", "locked")
      .otherwise("todo")
    val isNested = col("o_orderkey") % 3 =!= 0 && coalesce(col("n_tasks"), lit(0L)) > 0
    val nTasks = coalesce(col("n_tasks"), lit(0L))
    j.select(
        col("o_orderkey").as("__okey"),
        concat(lit("item_"), col("o_orderkey").cast("string")).as("itemID"),
        concat(lit("grp_"), (col("o_custkey") % 100).cast("string")).as("taskID"),
        state.as("itemState"),
        when(!isNested, concat(lit("seq "), (col("o_orderkey") % 10).cast("string")))
          .as("taskScript"),
        when(state =!= "todo", concat(lit("lock_"), col("o_orderkey").cast("string")))
          .as("lockID"),
        when(state =!= "todo",
          concat(lit("jq-"), (col("o_custkey") % 5).cast("string"),
            lit("-"), (col("o_orderkey") % 97).cast("string"))).as("instanceID"),
        when(state =!= "todo", col("o_orderdate")).as("lockDate"),
        when(state.isin("done", "Wall_Time_Exceeded"),
          col("o_orderdate") + expr("INTERVAL 1 DAY")).as("doneDate"),
        (state === "Wall_Time_Exceeded").as("errorDate"),
        when(!isNested,
            when(state === "done", col("o_orderkey") % 10).otherwise(lit(0L)))
          .otherwise(
            when(state === "done", nTasks)
              .when(state === "todo", lit(0L))
              .otherwise(coalesce(col("n_r_tasks"), lit(0L))))
          .cast("long").as("logLength"),
        when(isNested, nTasks).as("nestedTaskCount"))
      .withColumn("log", typedEmptyLog)
  }

  /** Typed empty `log` map (canonical schema slot; the populated form lives
    * on [[nestedItems]]).
    */
  private def typedEmptyLog =
    map_from_entries(array().cast(
      "array<struct<key:string,value:struct<status:string,stdout:string,stderr:string>>>"))

  /** DuckDB CTE producing exactly [[items]]; prepend to oracle SQL. */
  val itemsCte: String =
    """WITH nt AS (
      |  SELECT l_orderkey, COUNT(*) AS n_tasks,
      |         COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_r_tasks
      |  FROM lineitem GROUP BY l_orderkey
      |), items AS (
      |  SELECT
      |    'item_' || CAST(o_orderkey AS VARCHAR) AS itemID,
      |    'grp_' || CAST(o_custkey % 100 AS VARCHAR) AS taskID,
      |    CASE WHEN o_orderkey % 53 = 0 THEN 'Wall_Time_Exceeded'
      |         WHEN o_orderstatus = 'F' THEN 'done'
      |         WHEN o_orderstatus = 'P' THEN 'locked'
      |         ELSE 'todo' END AS itemState,
      |    CASE WHEN NOT (o_orderkey % 3 <> 0 AND COALESCE(n_tasks, 0) > 0)
      |         THEN 'seq ' || CAST(o_orderkey % 10 AS VARCHAR) END AS taskScript,
      |    CASE WHEN (CASE WHEN o_orderkey % 53 = 0 THEN 'Wall_Time_Exceeded'
      |                    WHEN o_orderstatus = 'F' THEN 'done'
      |                    WHEN o_orderstatus = 'P' THEN 'locked'
      |                    ELSE 'todo' END) <> 'todo'
      |         THEN 'lock_' || CAST(o_orderkey AS VARCHAR) END AS lockID,
      |    CASE WHEN (CASE WHEN o_orderkey % 53 = 0 THEN 'Wall_Time_Exceeded'
      |                    WHEN o_orderstatus = 'F' THEN 'done'
      |                    WHEN o_orderstatus = 'P' THEN 'locked'
      |                    ELSE 'todo' END) <> 'todo'
      |         THEN 'jq-' || CAST(o_custkey % 5 AS VARCHAR) || '-' || CAST(o_orderkey % 97 AS VARCHAR)
      |         END AS instanceID,
      |    CASE WHEN (CASE WHEN o_orderkey % 53 = 0 THEN 'Wall_Time_Exceeded'
      |                    WHEN o_orderstatus = 'F' THEN 'done'
      |                    WHEN o_orderstatus = 'P' THEN 'locked'
      |                    ELSE 'todo' END) <> 'todo'
      |         THEN o_orderdate END AS lockDate,
      |    CASE WHEN (CASE WHEN o_orderkey % 53 = 0 THEN 'Wall_Time_Exceeded'
      |                    WHEN o_orderstatus = 'F' THEN 'done'
      |                    WHEN o_orderstatus = 'P' THEN 'locked'
      |                    ELSE 'todo' END) IN ('done', 'Wall_Time_Exceeded')
      |         THEN o_orderdate + INTERVAL 1 DAY END AS doneDate,
      |    (o_orderkey % 53 = 0) AS errorDate,
      |    CAST(CASE WHEN NOT (o_orderkey % 3 <> 0 AND COALESCE(n_tasks, 0) > 0)
      |         THEN (CASE WHEN o_orderkey % 53 <> 0 AND o_orderstatus = 'F'
      |                    THEN o_orderkey % 10 ELSE 0 END)
      |         ELSE (CASE WHEN o_orderkey % 53 = 0 THEN COALESCE(n_r_tasks, 0)
      |                    WHEN o_orderstatus = 'F' THEN n_tasks
      |                    WHEN o_orderstatus = 'P' THEN COALESCE(n_r_tasks, 0)
      |                    ELSE 0 END)
      |         END AS BIGINT) AS logLength,
      |    CASE WHEN o_orderkey % 3 <> 0 AND COALESCE(n_tasks, 0) > 0
      |         THEN n_tasks END AS nestedTaskCount
      |  FROM orders LEFT JOIN nt ON o_orderkey = l_orderkey
      |)""".stripMargin

  /** Nested task rows: `(itemID, taskKey, status, script)` — the exploded
    * view of the reference's `TaskScript` map for nested items. Keys are
    * `Task_0..Task_{n-1}` in deterministic `(l_linenumber, l_partkey,
    * l_suppkey)` order (unique within an order in this data).
    */
  def nestedTaskRows(spark: SparkSession, sfDir: String): DataFrame =
    nestedTaskRowsKeyed(spark, sfDir).drop("__okey")

  /** [[nestedTaskRows]] plus `__okey` — lets the map build aggregate and
    * join on the numeric key whose hash partitioning the lineitem⋈orders
    * join and the task-index window already established (zero extra
    * exchanges), instead of re-shuffling the full task-row set on the
    * derived `itemID` string.
    */
  private def nestedTaskRowsKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val state = when(col("o_orderkey") % 53 === 0, "Wall_Time_Exceeded")
      .when(col("o_orderstatus") === "F", "done")
      .when(col("o_orderstatus") === "P", "locked")
      .otherwise("todo")
    li.join(o.filter(col("o_orderkey") % 3 =!= 0),
        li("l_orderkey") === o("o_orderkey"), "inner")
      .withColumn("task_idx", row_number().over(w) - 1)
      .select(
        col("o_orderkey").as("__okey"),
        concat(lit("item_"), col("o_orderkey").cast("string")).as("itemID"),
        concat(lit("Task_"), col("task_idx").cast("string")).as("taskKey"),
        when(state === "done", "done")
          .when(state === "todo", "todo")
          .otherwise(when(col("l_returnflag") === "R", "done").otherwise("todo"))
          .as("status"),
        concat(lit("seq "), col("l_quantity").cast("int").cast("string")).as("script"))
  }

  /** DuckDB CTE producing exactly [[nestedTaskRows]] (view name `ntasks`). */
  val nestedTaskRowsCte: String =
    """WITH ntasks AS (
      |  SELECT
      |    'item_' || CAST(o_orderkey AS VARCHAR) AS itemID,
      |    'Task_' || CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |        ORDER BY l_linenumber, l_partkey, l_suppkey) - 1 AS VARCHAR) AS taskKey,
      |    CASE WHEN o_orderkey % 53 <> 0 AND o_orderstatus = 'F' THEN 'done'
      |         WHEN o_orderkey % 53 <> 0 AND o_orderstatus NOT IN ('F','P') THEN 'todo'
      |         WHEN l_returnflag = 'R' THEN 'done'
      |         ELSE 'todo' END AS status,
      |    'seq ' || CAST(CAST(l_quantity AS INT) AS VARCHAR) AS script
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderkey % 3 <> 0
      |)""".stripMargin

  /** Derived compute-backend job table for the J1 enrichment join: one row
    * per distinct jobID among locked items, with a deterministic status;
    * every `(q+r) % 5 == 4` job is *absent* so the join's ERROR_FETCHING
    * path (missing job) is exercised. Mirrors the AWS Batch `describe_jobs`
    * result the reference fetches per item (`code/manager.py:971-983`).
    */
  def batchJobs(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.filter(col("o_orderstatus") === "P" && col("o_orderkey") % 53 =!= 0)
      .select((col("o_custkey") % 5).as("q"), (col("o_orderkey") % 97).as("r"))
      .distinct()
      .filter((col("q") + col("r")) % 5 =!= 4)
      .select(
        concat(lit("jq-"), col("q").cast("string"), lit(":"), col("r").cast("string"))
          .as("jobID"),
        when((col("q") + col("r")) % 5 === 0, "SUCCEEDED")
          .when((col("q") + col("r")) % 5 === 1, "FAILED")
          .when((col("q") + col("r")) % 5 === 2, "RUNNING")
          .otherwise("PENDING").as("job_status"))
  }

  /** DuckDB CTE producing exactly [[batchJobs]] (view name `jobs`). */
  val batchJobsCte: String =
    """jobs AS (
      |  SELECT 'jq-' || CAST(q AS VARCHAR) || ':' || CAST(r AS VARCHAR) AS jobID,
      |         CASE (q + r) % 5 WHEN 0 THEN 'SUCCEEDED' WHEN 1 THEN 'FAILED'
      |              WHEN 2 THEN 'RUNNING' ELSE 'PENDING' END AS job_status
      |  FROM (SELECT DISTINCT o_custkey % 5 AS q, o_orderkey % 97 AS r
      |        FROM orders WHERE o_orderstatus = 'P' AND o_orderkey % 53 <> 0)
      |  WHERE (q + r) % 5 <> 4
      |)""".stripMargin

  /** The nested map shape itself (`nestedTasks: map<string, struct>`), built
    * with one `collect_list` per item then `map_from_entries` — the Spark
    * rewrite of the reference's per-key map (SURVEY.md §1.2). Used by the
    * map-mutation operators (M1-M10); oracle checks go through the exploded
    * row view instead since DuckDB compares rows, not Spark maps.
    */
  private val nestedMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Memoized + cached per (session, sfDir): six mutation gate queries each
    * consume this map-shaped table, and the collect_list aggregation that
    * builds it is the most expensive part of each — one cached build
    * amortizes across the whole gate/bench run.
    */
  def nestedItems(spark: SparkSession, sfDir: String): DataFrame =
    nestedMemo.getOrElseUpdate((spark, sfDir), buildNestedItems(spark, sfDir).cache())

  private def buildNestedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = nestedTaskRowsKeyed(spark, sfDir)
    // array_sort over (idx, entry) keeps map insertion order deterministic;
    // grouping and joining on __okey rides the existing o_orderkey hash
    // partitioning end-to-end (no itemID-string re-shuffle of task rows)
    val entries = rows
      .withColumn("idx",
        substring_index(col("taskKey"), "_", -1).cast("int"))
      .groupBy(col("__okey"))
      .agg(array_sort(collect_list(struct(col("idx").as("i"),
        struct(col("taskKey").as("key"),
          struct(col("status"), col("script")).as("value")).as("e")))).as("arr"))
      .select(
        col("__okey"),
        map_from_entries(transform(col("arr"), x => x.getField("e"))).as("nestedTasks"),
        // log holds one entry per done task (Log_Length ≡ size(log) invariant)
        map_from_entries(transform(
          filter(col("arr"), x => x.getField("e").getField("value").getField("status") === "done"),
          x => struct(
            x.getField("e").getField("key").as("key"),
            struct(lit("Done").as("status"),
              concat(lit("out:"), x.getField("e").getField("value").getField("script"))
                .as("stdout"),
              lit("").as("stderr")).as("value")))).as("log"))
    itemsKeyed(spark, sfDir).filter(col("nestedTaskCount").isNotNull)
      .drop("taskScript").drop("log")
      .join(entries, Seq("__okey"), "inner")
      .drop("__okey")
  }
}
