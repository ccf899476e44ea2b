package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.connector.WorkQueueSource

class WorkQueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-queue").toString + "/q"
    WorkQueueSource.write(
      DerivedItems.items(spark, sf0001)
        .select($"itemID", $"taskID", $"itemState", $"logLength", $"nestedTaskCount"), p)
    p
  }

  private def queue = spark.read
    .format("graft.store.connector.WorkQueueSource")
    .option("path", path).load()

  test("connector round-trips the queue with correct values") {
    val viaConnector = queue.select($"itemID", $"itemState", $"logLength")
      .as[(String, String, Long)].collect().toSet
    val direct = DerivedItems.items(spark, sf0001)
      .select($"itemID", $"itemState", $"logLength")
      .as[(String, String, Long)].collect().toSet
    assert(viaConnector === direct)
  }

  test("itemState equality pushes down and prunes state directories (GSI analog)") {
    val q = queue.filter($"itemState" === "todo")
    val rows = q.count()
    val expected = DerivedItems.items(spark, sf0001)
      .filter($"itemState" === "todo").count()
    assert(rows === expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedState=Some(todo)"), plan.take(600))
  }

  test("column pruning reaches the reader (ProjectionExpression analog, P1)") {
    val q = queue.select($"itemID")
    assert(q.count() === 1500)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("columns=itemID") && !plan.contains("columns=itemID,taskID"),
      plan.take(600))
  }
}
