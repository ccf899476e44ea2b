package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.StateQueries
import graft.store.DerivedItems

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nested = DerivedItems.nestedItems(spark, sf0001).cache()

  test("histogram buckets partition the full pct range 0..100 exhaustively (A3)") {
    // one item per pct value; buckets must cover each value exactly once
    val items = (0 to 100).map(p => (s"it_$p", p.toLong, 100L))
      .toDF("itemID", "logLength", "nestedTaskCount")
    val hist = StateQueries.progressHistogram(items)
      .select($"bucket", $"n").as[(String, Long)].collect().toMap
    assert(hist.values.sum === 101L)
    assert(hist === Map(
      "todo" -> 1L, // pct 0
      "Q1" -> 25L, // 1..25
      "Q2" -> 25L, // 26..50
      "Q3" -> 25L, // 51..75
      "Q4" -> 24L, // 76..99
      "done" -> 1L)) // 100
  }

  test("record-then-reset round-trips tasks that were todo; reset forces the rest (M1/M4)") {
    val pred = col("itemState") === "locked"
    val lockedIds = nested.filter(pred).select($"itemID").as[String].collect().toSet
    val original = Mutations.explodeTasks(nested).orderBy("itemID", "taskKey").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val recorded = Mutations.recordTaskResult(nested, pred, "Task_1", lit("x"), lit(""))
    val restored = Mutations.resetNestedTask(recorded, pred, "Task_1")
    val after = Mutations.explodeTasks(restored).orderBy("itemID", "taskKey").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    after.foreach { case (key @ (id, task), status) =>
      if (lockedIds.contains(id) && task == "Task_1")
        // M1 resets the named key unconditionally (manager.py:553-598) —
        // identity where it was todo, forced-todo where it was done
        assert(status === "todo", s"$key")
      else
        assert(status === original(key), s"$key")
    }
  }

  test("logLength ≡ done-task count invariant holds through record and reset (A6)") {
    def invariantViolations(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("nestedTasks").isNotNull)
        .withColumn("n_done",
          size(map_filter(col("nestedTasks"), (_, v) => v.getField("status") === "done")))
        .filter(col("logLength") =!= col("n_done")).count()
    assert(invariantViolations(nested) === 0)
    val recorded = Mutations.recordTaskResult(
      nested, col("itemState") === "locked", "Task_0", lit("out"), lit(""))
    assert(invariantViolations(recorded) === 0)
    val reset = Mutations.resetNestedTask(recorded, col("itemState") =!= "done", "Task_2")
    assert(invariantViolations(reset) === 0)
  }

  test("claim is exactly-once and idempotent (modifier.py:36-125 replacement)") {
    val items = DerivedItems.items(spark, sf0001)
      .withColumn("nestedTasks",
        lit(null).cast("map<string,struct<status:string,script:string>>"))
    val now = to_timestamp(lit("2026-01-01 00:00:00"))
    val claimed = graft.queries.ExecutionSurface.claimTodo(items, "w1", now)
    assert(claimed.filter($"itemState" === "todo").count() === 0)
    assert(graft.exec.Runner.todoTasks(claimed).isEmpty)
    // re-claim with a different worker: nothing left to claim, no lock stolen
    val reclaimed = graft.queries.ExecutionSurface.claimTodo(claimed, "w2", now)
    assert(reclaimed.filter($"instanceID" === "w2").count() === 0)
  }

  test("empty key list deletes every nested task — destructive default (M3)") {
    val cleared = Mutations.deleteNestedTasks(nested, lit(true), Seq.empty)
    assert(Mutations.explodeTasks(cleared).count() === 0)
    assert(cleared.filter(size(map_keys($"log")) > 0).count() === 0)
  }

  test("upsertByKey (one-shuffle window form) ≡ anti-join form, incl. duplicates (J2)") {
    // keys: k1 only existing (duplicated), k2 both sides, k3 only incoming
    // (duplicated), k4 neither-dup overlap
    val existing = Seq(("k1", "e1"), ("k1", "e1b"), ("k2", "e2"), ("k4", "e4"))
      .toDF("k", "v")
    val incoming = Seq(("k2", "i2"), ("k3", "i3"), ("k3", "i3b"), ("k4", "i4"))
      .toDF("k", "v")
    val got = Mutations.upsertByKey(existing, incoming, Seq("k"))
      .as[(String, String)].collect().toSeq.sorted
    val antiForm = existing.unionByName(
        incoming.join(existing.select("k").distinct(), Seq("k"), "left_anti"))
      .as[(String, String)].collect().toSeq.sorted
    assert(got === antiForm)
    assert(got === Seq(("k1", "e1"), ("k1", "e1b"), ("k2", "e2"),
      ("k3", "i3"), ("k3", "i3b"), ("k4", "e4")))
    // composite keys route through the same window
    val e2c = Seq(("a", 1, "x")).toDF("k1", "k2", "v")
    val i2c = Seq(("a", 1, "y"), ("a", 2, "z")).toDF("k1", "k2", "v")
    assert(Mutations.upsertByKey(e2c, i2c, Seq("k1", "k2"))
      .as[(String, Int, String)].collect().toSet ===
      Set(("a", 1, "x"), ("a", 2, "z")))
  }
}
