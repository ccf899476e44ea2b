package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.exec.Runner
import graft.ops.Mutations
import graft.queries.StateQueries
import graft.store.{Importer, ItemStore}

/** CLI entry (X6/X7 — reference `code/pyanamo.py:48-138`,
  * `code/import-items.py`): one `spark-submit`-able main with the worker,
  * importer and manager verbs.
  *
  * {{{
  *   graft.Main import  --table /path/items --input items.txt [--delim '|'] [--nested-delim ',']
  *   graft.Main run     --table /path/items [--budget 3600] [--parallelism 32]
  *   graft.Main monitor --table /path/items
  *   graft.Main reset   --table /path/items [--state Wall_Time_Exceeded] [--to todo]
  *   graft.Main delete  --table /path/items --task-group grp_7
  * }}}
  */
object Main {

  private def parseFlags(args: Seq[String]): Map[String, String] =
    args.grouped(2).collect { case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <import|run|monitor|reset|delete> --table PATH ...")
    val verb = args.head
    val flags = parseFlags(args.tail.toSeq)
    val table = flags.getOrElse("table", sys.error("--table is required"))
    val spark = SparkSession.builder()
      .appName(s"graft-$verb")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, verb, table, flags)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, verb: String, table: String,
      flags: Map[String, String]): Unit = verb match {
    case "import" =>
      val items = Importer.importFile(spark,
        flags.getOrElse("input", sys.error("--input is required")),
        flags.getOrElse("delim", "|"),
        flags.get("nested-delim"),
        flags.get("force").contains("1"))
      if (!ItemStore.exists(spark, table)) ItemStore.create(spark, table)
      ItemStore.append(items, table)
      // import tally (A9 — manager.py:376-399)
      println(s"""{"N": ${ItemStore.load(spark, table).count()}}""")
    case "run" =>
      val (updated, outcomes) = Runner.processItems(
        ItemStore.load(spark, table),
        Runner.RunConfig(
          env = flags.get("env").map(_.split(',').map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap).getOrElse(Map.empty),
          budgetSeconds = flags.get("budget").map(_.toDouble),
          parallelism = flags.get("parallelism").map(_.toInt).getOrElse(0)))
      val tmp = table + ".next"
      ItemStore.save(updated, tmp)
      ItemStore.drop(spark, table)
      new java.io.File(tmp).renameTo(new java.io.File(table))
      println(s"""{"executed": ${outcomes.count()}}""")
    case "monitor" =>
      StateQueries.itemCounter(ItemStore.load(spark, table)).show(truncate = false)
      StateQueries.progressHistogram(ItemStore.load(spark, table)).show(truncate = false)
    case "reset" =>
      val from = flags.getOrElse("state", "Wall_Time_Exceeded")
      val updated = Mutations.resetItems(ItemStore.load(spark, table),
        col("itemState") === from, flags.getOrElse("to", "todo"), resetTasks = true)
      val tmp = table + ".next"
      ItemStore.save(updated, tmp)
      ItemStore.drop(spark, table)
      new java.io.File(tmp).renameTo(new java.io.File(table))
    case "delete" =>
      val updated = Mutations.deleteItems(ItemStore.load(spark, table),
        col("taskID") === flags.getOrElse("task-group", sys.error("--task-group required")))
      val tmp = table + ".next"
      ItemStore.save(updated, tmp)
      ItemStore.drop(spark, table)
      new java.io.File(tmp).renameTo(new java.io.File(table))
    case other => sys.error(s"unknown verb: $other")
  }
}
