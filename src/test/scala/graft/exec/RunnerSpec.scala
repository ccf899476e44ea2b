package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Importer

/** End-to-end executor test mirroring the reference's seq-based fixture
  * session (`README.md:54-80`): import a delimited file of `seq` tasks, run
  * the engine, assert final states + logs + counters.
  */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def importFixture(): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-import").toFile
    val f = new java.io.File(dir, "items.txt")
    val w = new java.io.PrintWriter(f)
    // single items + nested items, README.md:56-74 shape
    w.println("itemID|taskID|TaskScript|TaskArgs")
    w.println("Seq_Test_1|Task_1|seq 2|")
    w.println("Seq_Tests|Seq_8_2_1|seq|8,2,1")
    w.println("Fail_Item|Task_F|exit 3|")
    w.close()
    Importer.importFile(spark, f.getAbsolutePath, "|", nestedDelim = Some(","))
  }

  test("import synthesizes single + nested shapes (manager.py:291-349)") {
    val items = importFixture().cache()
    assert(items.count() === 3)
    val nested = items.filter($"nestedTasks".isNotNull).select($"itemID").as[String].collect()
    assert(nested.toSeq === Seq("Seq_Tests"))
    val tasks = items.filter($"itemID" === "Seq_Tests")
      .select(explode($"nestedTasks"))
      .select($"key", $"value.status", $"value.script")
      .as[(String, String, String)].collect()
      .map { case (k, s, sc) => k -> ((s, sc)) }.toMap
    assert(tasks === Map(
      "Task_0" -> (("todo", "seq 8")),
      "Task_1" -> (("todo", "seq 2")),
      "Task_2" -> (("todo", "seq 1"))))
    assert(items.filter($"itemID" === "Seq_Tests").select($"nestedTaskCount").as[Long].head() === 3L)
  }

  test("header without itemID is rejected unless forced (manager.py:417-422)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-import").toFile
    val f = new java.io.File(dir, "bad.txt")
    val w = new java.io.PrintWriter(f); w.println("a|b|c"); w.println("x|y|z"); w.close()
    intercept[IllegalArgumentException] {
      Importer.importFile(spark, f.getAbsolutePath, "|")
    }
    assert(Importer.importFile(spark, f.getAbsolutePath, "|", forceImport = true).count() === 1)
  }

  test("processItems runs scripts end-to-end and merges states/logs (runner.py:144-238)") {
    val items = importFixture()
    val (updated0, outcomes) = Runner.processItems(items)
    val updated = updated0.cache()
    assert(outcomes.count() === 5) // 2 singles + 3 nested tasks

    // every item terminal
    val states = updated.select($"itemID", $"itemState").as[(String, String)].collect().toMap
    assert(states === Map(
      "Seq_Test_1" -> "done", "Seq_Tests" -> "done", "Fail_Item" -> "done"))

    // single: stdout captured, logLength = newline count (executor.py:80)
    val singleLog = updated.filter($"itemID" === "Seq_Test_1")
      .select(element_at($"log", "single").getField("stdout")).as[String].head()
    assert(singleLog === "1\n2\n")
    assert(updated.filter($"itemID" === "Seq_Test_1").select($"logLength").as[Long].head() === 2L)

    // failure: marked done but errorDate flags it (modifier.py:167)
    assert(updated.filter($"itemID" === "Fail_Item").select($"errorDate").as[Boolean].head())
    val failStatus = updated.filter($"itemID" === "Fail_Item")
      .select(element_at($"log", "single").getField("status")).as[String].head()
    assert(failStatus === "Failed")

    // nested: all tasks done, counter = 3 (modifier.py:240-249)
    val nestedStates = updated.filter($"itemID" === "Seq_Tests")
      .select(explode($"nestedTasks"))
      .select($"key", $"value.status").as[(String, String)].collect().toMap
    assert(nestedStates === Map("Task_0" -> "done", "Task_1" -> "done", "Task_2" -> "done"))
    assert(updated.filter($"itemID" === "Seq_Tests").select($"logLength").as[Long].head() === 3L)
    val t0out = updated.filter($"itemID" === "Seq_Tests")
      .select(element_at($"log", "Task_0").getField("stdout")).as[String].head()
    assert(t0out === (1 to 8).mkString("", "\n", "\n"))
  }

  test("re-run after partial completion only claims todo work (runner.py:101-105)") {
    val items = importFixture()
    // mark Task_0/Task_1 done by hand → only Task_2 + the singles remain
    val partial = graft.ops.Mutations.recordTaskResult(
      graft.ops.Mutations.recordTaskResult(items, $"itemID" === "Seq_Tests",
        "Task_0", lit("x"), lit("")),
      $"itemID" === "Seq_Tests", "Task_1", lit("y"), lit(""))
    val claimable = Runner.todoTasks(partial).collect()
    assert(claimable.map(t => (t.itemID, t.taskKey)).toSet ===
      Set(("Seq_Test_1", None), ("Fail_Item", None), ("Seq_Tests", Some("Task_2"))))
  }

  test("zero budget marks everything Wall_Time_Exceeded without executing (T4)") {
    val items = importFixture()
    val (updated, outcomes) = Runner.processItems(items,
      Runner.RunConfig(budgetSeconds = Some(-1.0)))
    assert(outcomes.filter(_.status == "Wall_Time_Exceeded").count() === 5)
    val states = updated.select($"itemID", $"itemState").as[(String, String)].collect().toMap
    // fully budget-skipped items were never claimed — ALL stay todo
    // (runner.py:126-141: TimeKeeperError raises before the claim)
    assert(states === Map(
      "Seq_Tests" -> "todo", "Seq_Test_1" -> "todo", "Fail_Item" -> "todo"))
  }

  test("mid-item budget cutoff marks a partially-run nested item Wall_Time_Exceeded") {
    val items = importFixture().filter($"itemID" === "Seq_Tests")
    // record Task_0 as already done, then run with zero budget: the item ran
    // before (claimed), its remaining tasks are cut off -> complete-test
    // keeps counting and the re-run with budget finishes it
    val partial = graft.ops.Mutations.recordTaskResult(
      items, lit(true), "Task_0", lit("x"), lit(""))
    val (updated, _) = Runner.processItems(partial,
      Runner.RunConfig(budgetSeconds = Some(-1.0)))
    // nothing launched this run -> state unchanged (todo), progress kept
    assert(updated.select($"itemState").as[String].head() === "todo")
    assert(updated.select($"logLength").as[Long].head() === 1L)
    val (finished, _) = Runner.processItems(updated)
    assert(finished.select($"itemState").as[String].head() === "done")
    assert(finished.select($"logLength").as[Long].head() === 3L)
  }
}
