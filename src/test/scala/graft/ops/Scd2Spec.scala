package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim() = Scd2.seed(
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "attr", "n"))

  test("scd2 merge: change closes + re-versions, no-op keeps, new inserts") {
    val changes = Seq(
      (1L, "a2", 10, 500L),  // attr change
      (2L, "b", 20, 500L),   // no-op re-delivery
      (9L, "z", 90, 500L),   // new key
    ).toDF("k", "attr", "n", "eff_us")
    val out = Scd2.merge(dim(), changes, "k", Seq("attr", "n"))
      .orderBy("k", "valid_from")
      .as[(Long, String, Int, Long, Option[Long], Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 10, 0L, Some(500L), false),
      (1L, "a2", 10, 500L, None, true),
      (2L, "b", 20, 0L, None, true),
      (3L, "c", 30, 0L, None, true),
      (9L, "z", 90, 500L, None, true)))
  }

  test("scd2 merge is idempotent on re-delivery and chains versions") {
    val c1 = Seq((1L, "a2", 10, 500L)).toDF("k", "attr", "n", "eff_us")
    val once = Scd2.merge(dim(), c1, "k", Seq("attr", "n"))
    val twice = Scd2.merge(once, c1, "k", Seq("attr", "n"))
    assert(twice.count() === once.count(), "re-delivered batch must be a no-op")

    val c2 = Seq((1L, "a3", 10, 900L)).toDF("k", "attr", "n", "eff_us")
    val chained = Scd2.merge(twice, c2, "k", Seq("attr", "n"))
      .filter($"k" === 1L).orderBy("valid_from")
      .as[(Long, String, Int, Long, Option[Long], Boolean)].collect().toSeq
    assert(chained === Seq(
      (1L, "a", 10, 0L, Some(500L), false),
      (1L, "a2", 10, 500L, Some(900L), false),
      (1L, "a3", 10, 900L, None, true)))
    // invariant: exactly one open row per key, timeline gap-free
    assert(chained.count(_._6) === 1)
  }

  test("null-safe attr compare: null -> value and value -> null both version") {
    val d = Scd2.seed(Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "attr"))
    val changes = Seq((1L, Some("v"), 100L), (2L, Option.empty[String], 100L))
      .toDF("k", "attr", "eff_us")
    val out = Scd2.merge(d, changes, "k", Seq("attr"))
    assert(out.filter($"is_current" && $"valid_from" === 100L).count() === 2)
    assert(out.filter(!$"is_current").count() === 2)
  }

  test("pointInTime picks the version valid at each fact's timestamp") {
    val c1 = Seq((1L, "a2", 10, 500L)).toDF("k", "attr", "n", "eff_us")
    val d = Scd2.merge(dim(), c1, "k", Seq("attr", "n"))
    val facts = Seq(
      (100L, 1L, 250L),  // before the change: sees "a"
      (101L, 1L, 500L),  // exactly at eff: new version is valid FROM eff
      (102L, 1L, 900L),  // after: sees "a2"
      (103L, 7L, 500L),  // unknown key: null attrs survive the left join
    ).toDF("fact_id", "k", "ts")
    val out = Scd2.pointInTime(facts, "k", "ts", d, "k")
      .orderBy("fact_id")
      .as[(Long, Long, Long, Option[String], Option[Int])].collect().toSeq
    assert(out === Seq(
      (100L, 1L, 250L, Some("a"), Some(10)),
      (101L, 1L, 500L, Some("a2"), Some(10)),
      (102L, 1L, 900L, Some("a2"), Some(10)),
      (103L, 7L, 500L, None, None)))
  }

  test("history rows never join: plan keeps them out of the merge join") {
    val c1 = Seq((1L, "a2", 10, 500L)).toDF("k", "attr", "n", "eff_us")
    val once = Scd2.merge(dim(), c1, "k", Seq("attr", "n"))
    // closed row for k=1 must be carried verbatim through a second merge
    val c2 = Seq((1L, "a4", 77, 900L)).toDF("k", "attr", "n", "eff_us")
    val out = Scd2.merge(once, c2, "k", Seq("attr", "n"))
    val closed = out.filter($"k" === 1L && $"valid_from" === 0L)
      .as[(Long, String, Int, Long, Option[Long], Boolean)].head()
    assert(closed === ((1L, "a", 10, 0L, Some(500L), false)))
  }
}
