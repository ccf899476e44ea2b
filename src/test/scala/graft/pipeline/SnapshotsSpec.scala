package graft.pipeline

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("diffSnapshots classifies added/removed/changed/unchanged") {
    val oldSnap = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "fr"),
      (4L, "delta", "de")).toDF("id", "text", "lang")
    val newSnap = Seq(
      (1L, "alpha", "en"),      // unchanged
      (2L, "beta2", "en"),      // changed text
      (3L, "gamma", "es"),      // changed lang
      (5L, "epsilon", "zh"))    // added; 4 removed
      .toDF("id", "text", "lang")
    val out = Snapshots.diffSnapshots(oldSnap, newSnap, "id",
        Seq("text", "lang"))
      .select("key", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("row fingerprint distinguishes NULL from empty string") {
    val oldSnap = Seq((1L, Some(""), "x"), (2L, Some("a"), "y"))
      .toDF("id", "text", "lang")
    val newSnap = Seq((1L, None: Option[String], "x"), (2L, Some("a"), "y"))
      .toDF("id", "text", "lang")
    val out = Snapshots.diffSnapshots(oldSnap, newSnap, "id",
        Seq("text", "lang"))
      .select("key", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("column boundaries cannot be gamed by separator-straddling values") {
    // ("ab", "c") vs ("a", "bc") must fingerprint differently
    val oldSnap = Seq((1L, "ab", "c")).toDF("id", "text", "lang")
    val newSnap = Seq((1L, "a", "bc")).toDF("id", "text", "lang")
    val out = Snapshots.diffSnapshots(oldSnap, newSnap, "id",
        Seq("text", "lang"))
      .select("change").as[String].head()
    assert(out === "changed")
  }
}
