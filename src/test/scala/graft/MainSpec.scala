package graft

import org.apache.spark.sql.functions._

/** End-to-end CLI verb test: import → run → monitor → reset → delete over a
  * real store (mirrors the reference's REPL doc sessions, SURVEY §5).
  */
class MainSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toFile
    val f = new java.io.File(dir, "items.txt")
    val w = new java.io.PrintWriter(f)
    w.println("itemID|taskID|TaskScript|TaskArgs")
    w.println("One|g1|seq 3|")
    w.println("Nest|g1|seq|4,5")
    w.close()
    f.getAbsolutePath
  }

  test("import → run → reset lifecycle through the CLI verbs (X6/X7)") {
    val table = java.nio.file.Files.createTempDirectory("graft-cli-store").toString + "/t"
    Main.run(spark, "import", table,
      Map("input" -> writeFixture(), "delim" -> "|", "nested-delim" -> ","))
    val imported = store.ItemStore.load(spark, table)
    assert(imported.count() === 2)
    assert(imported.filter($"itemState" === "todo").count() === 2)

    Main.run(spark, "run", table, Map.empty)
    val ran = store.ItemStore.load(spark, table)
    assert(ran.filter($"itemState" === "done").count() === 2)
    assert(ran.filter($"itemID" === "Nest").select($"logLength").as[Long].head() === 2L)

    Main.run(spark, "reset", table, Map("state" -> "done", "to" -> "todo"))
    val reset = store.ItemStore.load(spark, table)
    assert(reset.filter($"itemState" === "todo").count() === 2)
    assert(reset.filter($"logLength" =!= 0L).count() === 0)

    Main.run(spark, "delete", table, Map("task-group" -> "g1"))
    assert(store.ItemStore.load(spark, table).count() === 0)
  }
}
