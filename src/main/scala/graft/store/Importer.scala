package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.WorkItem

/** Import pipeline: delimited text → work items (SURVEY.md §2 S6/S8, F1/F2,
  * P4; reference `code/manager.py:363-461`, `code/import-items.py`).
  *
  * The reference reads the file on the client and issues one `put_item` per
  * line (N network round trips, no batching — `code/manager.py:376-399`).
  * Here the whole import is one distributed job: csv scan → column
  * transforms → a single batched write, which is the shape that survives a
  * 100 TB import (the parse+synthesis is per-row and embarrassingly
  * parallel; no shuffle at all).
  */
object Importer {

  /** Read a delimited import file with header (`itemID<d>taskID<d>TaskScript[<d>TaskArgs]`).
    * Header guard: reference rejects files whose header lacks `itemID`
    * unless `force_import` (`code/manager.py:417-422`).
    */
  def importFile(
      spark: SparkSession,
      path: String,
      delim: String = "|",
      nestedDelim: Option[String] = None,
      forceImport: Boolean = false): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", delim)
      .option("mode", "PERMISSIVE")
      .csv(path)
    if (!forceImport && !raw.columns.map(_.toLowerCase).contains("itemid"))
      throw new IllegalArgumentException(
        s"import header must contain itemID (got ${raw.columns.mkString(",")}); use forceImport to override")
    if (raw.columns.length < 3)
      throw new IllegalArgumentException(
        s"import file needs at least itemID<d>taskID<d>TaskScript columns, got ${raw.columns.length}")
    val cols = raw.columns
    val named = raw
      .withColumnRenamed(cols(0), "itemID")
      .withColumnRenamed(cols(1), "taskID")
      .withColumnRenamed(cols(2), "taskScript")
    val withArgs =
      if (cols.length > 3) named.withColumnRenamed(cols(3), "taskArgs")
      else named.withColumn("taskArgs", lit(null).cast("string"))
    fromRaw(withArgs, nestedDelim)
  }

  /** Synthesize the `Task_i` nested map from a per-item args list:
    * `Task_i -> {status: 'todo', script: script + ' ' + arg}` with repeated
    * blanks collapsed — reference `code/manager.py:326-335` (F2).
    */
  def nestedTasksFromArgs(script: Column, args: Column, nestedDelim: String): Column = {
    val quoted = java.util.regex.Pattern.quote(nestedDelim)
    map_from_entries(
      transform(
        split(args, quoted),
        (arg, i) =>
          struct(
            concat(lit("Task_"), i.cast("string")).as("key"),
            struct(
              lit("todo").as("status"),
              regexp_replace(concat(script, lit(" "), arg), " +", " ").as("script")
            ).as("value"))))
  }

  /** Raw import rows (`itemID, taskID, taskScript, taskArgs`) → canonical
    * work items. A row becomes nested iff a nested delimiter is configured
    * and `taskArgs` is non-blank (the reference branches per line on the
    * parsed field count — `code/manager.py:388-396`).
    */
  def fromRaw(raw: DataFrame, nestedDelim: Option[String]): DataFrame = {
    val isNested = nestedDelim match {
      case Some(_) => col("taskArgs").isNotNull && trim(col("taskArgs")) =!= ""
      case None => lit(false)
    }
    val nested = nestedDelim match {
      case Some(nd) => nestedTasksFromArgs(col("taskScript"), col("taskArgs"), nd)
      case None => lit(null).cast(org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, WorkItem.nestedTaskType))
    }
    raw
      .filter(col("itemID").isNotNull && trim(col("itemID")) =!= "") // blank-line filter (manager.py:419)
      // nestedTasks FIRST, in its own projection: the map-synthesis lambda
      // captures col("taskScript"), and building it in the same select that
      // re-aliases taskScript would resolve the capture against the new
      // (nulled) alias instead of the input column
      .withColumn("nestedTasks", when(isNested, nested))
      .withColumn("nestedTaskCount",
        when(isNested, size(split(col("taskArgs"),
          java.util.regex.Pattern.quote(nestedDelim.getOrElse(",")))).cast("long")))
      .withColumn("taskScript", when(!isNested, col("taskScript")))
      .select(
        col("itemID"),
        col("taskID"),
        col("taskScript"),
        col("nestedTasks"),
        lit("todo").as("itemState"),
        lit(null).cast("string").as("lockID"),
        lit(null).cast("string").as("instanceID"),
        lit(null).cast("timestamp").as("lockDate"),
        lit(null).cast("timestamp").as("doneDate"),
        lit(false).as("errorDate"),
        map_from_entries(array().cast("array<struct<key:string,value:struct<status:string,stdout:string,stderr:string>>>"))
          .as("log"),
        lit(0L).as("logLength"),
        col("nestedTaskCount"))
  }
}
