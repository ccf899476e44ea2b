package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ItemStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-store").toString
    val items = DerivedItems.items(spark, sf0001)
      .withColumn("nestedTasks",
        lit(null).cast("map<string,struct<status:string,script:string>>"))
      .select(graft.model.WorkItem.schema.fieldNames.map(col): _*)
    ItemStore.save(items, p)
    p
  }

  test("store round-trips the canonical schema") {
    val loaded = ItemStore.load(spark, path)
    assert(loaded.count() === 1500)
    assert(loaded.schema.fieldNames.sorted ===
      graft.model.WorkItem.schema.fieldNames.sorted)
  }

  test("state queries are partition-pruned (the GSI analog, SURVEY §1.3)") {
    val plan = ItemStore.load(spark, path)
      .filter($"itemState" === "todo")
      .queryExecution.executedPlan.toString
    // partition filter on itemState must reach the file scan, and the scan
    // must NOT read itemState as data (it's a partition column)
    assert(plan.contains("PartitionFilters") && plan.contains("itemState"), plan.take(500))
    val counted = ItemStore.load(spark, path).filter($"itemState" === "todo").count()
    val expected = DerivedItems.items(spark, sf0001).filter($"itemState" === "todo").count()
    assert(counted === expected)
  }

  test("DDL analogs: create empty, exists, append, drop (S11)") {
    val p = java.nio.file.Files.createTempDirectory("graft-ddl").toString + "/t1"
    assert(!ItemStore.exists(spark, p))
    ItemStore.create(spark, p)
    assert(ItemStore.exists(spark, p))
    assert(ItemStore.load(spark, p).count() === 0)
    val one = DerivedItems.items(spark, sf0001).limit(7)
      .withColumn("nestedTasks",
        lit(null).cast("map<string,struct<status:string,script:string>>"))
      .select(graft.model.WorkItem.schema.fieldNames.map(col): _*)
    ItemStore.append(one, p)
    assert(ItemStore.load(spark, p).count() === 7)
    ItemStore.drop(spark, p)
    assert(!ItemStore.exists(spark, p))
  }
}
