package graft.exec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.{Importer, ItemStore}

class StreamingRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dispatcher claims, executes and persists each micro-batch (T1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srun").toFile
    val f = new java.io.File(dir, "items.txt")
    val w = new java.io.PrintWriter(f)
    w.println("itemID|taskID|TaskScript|TaskArgs")
    w.println("S1|g|seq 2|")
    w.println("N1|g|seq|3,1")
    w.close()
    val store = dir.toPath.resolve("store").toString
    val results = dir.toPath.resolve("results").toString
    ItemStore.save(Importer.importFile(spark, f.getAbsolutePath, "|", Some(",")), store)

    val q = StreamingRunner.dispatcher(
      StreamingRunner.itemStream(spark, store), results)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir.toPath.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    val out = ItemStore.load(spark, results)
    val states = out.select($"itemID", $"itemState").as[(String, String)].collect().toMap
    assert(states === Map("S1" -> "done", "N1" -> "done"))
    assert(out.filter($"itemID" === "N1").select($"logLength").as[Long].head() === 2L)
    val stdout = out.filter($"itemID" === "S1")
      .select(element_at($"log", "single").getField("stdout")).as[String].head()
    assert(stdout === "1\n2\n")
  }

  test("claimed dispatcher skips items an external worker already holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srun2").toFile
    val f = new java.io.File(dir, "items.txt")
    val w = new java.io.PrintWriter(f)
    w.println("itemID|taskID|TaskScript|TaskArgs")
    w.println("Mine|g|seq 2|")
    w.println("Theirs|g|seq 9|")
    w.close()
    val store = dir.toPath.resolve("store").toString
    val results = dir.toPath.resolve("results").toString
    val registry = dir.toPath.resolve("registry").toString
    ItemStore.save(Importer.importFile(spark, f.getAbsolutePath, "|", Some(",")), store)

    // an external worker claims "Theirs" first through the same registry
    Seq(("Theirs", "external-lock", "other-host", null: String))
      .toDF("itemID", "lockID", "instanceID", "expectedLockID")
      .write.format("graft.store.connector.WorkQueueSource")
      .option("path", registry).mode("append").save()

    val q = StreamingRunner.claimedDispatcher(
      StreamingRunner.itemStream(spark, store), results, registry, "worker-1",
      leaseMillis = Some(60000L))
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", dir.toPath.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    // the dispatcher's claims carry a lease while scripts run, but a
    // COMPLETED item pins back to non-expiring — finished work must look
    // finished, not crashed, or a replayed claim would take it over after
    // one lease and re-execute it
    val mineState = graft.store.connector.WorkQueueClaimWrite.lockState(registry, "Mine")
    assert(mineState.map(_._3) === Some(0L),
      s"completed item's lock must pin non-expiring: $mineState")
    assert(mineState.exists(_._1.startsWith("lock-worker-1-")),
      s"completed item still held by the dispatcher: $mineState")
    val theirsState = graft.store.connector.WorkQueueClaimWrite.lockState(registry, "Theirs")
    assert(theirsState.map(_._3) === Some(0L))

    // only the item this dispatcher won executed; the external item is
    // untouched (it belongs to the other worker)
    val out = ItemStore.load(spark, results)
    assert(out.select($"itemID").as[String].collect().toSeq === Seq("Mine"))
    assert(out.select($"itemState").as[String].head() === "done")
    // the registry still shows the external holder
    val holders = graft.store.connector.WorkQueueSource.claimResults(spark, registry)
      .filter($"status" === "accepted")
      .select($"itemID", $"lockID").as[(String, String)].collect().toMap
    assert(holders("Theirs") === "external-lock")
    assert(holders("Mine").startsWith("lock-worker-1-"))
  }
}
