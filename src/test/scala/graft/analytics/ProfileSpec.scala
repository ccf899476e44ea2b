package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, distincts and formats min/max portably") {
    val df = Seq(
      (1L, Some("a"), Some(Timestamp.valueOf("2020-01-02 03:04:05")), Some(1.5)),
      (2L, None, Some(Timestamp.valueOf("2021-06-07 08:09:10")), None),
      (2L, Some("b"), None, Some(2.5)))
      .toDF("k", "s", "t", "d")
    val p = Profile.profile(df)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(p("k") === (("k", 3L, 0L, 2L, Some("1"), Some("2"))))
    assert(p("s") === (("s", 3L, 1L, 2L, Some("a"), Some("b"))))
    assert(p("t") === (("t", 3L, 1L, 2L,
      Some("2020-01-02 03:04:05"), Some("2021-06-07 08:09:10"))))
    // doubles: counted but no cross-engine min/max strings
    assert(p("d") === (("d", 3L, 1L, 2L, None, None)))
  }

  test("profile is partition-invariant and covers every column") {
    val df = graft.Tables.lineitem(spark, sf0001)
    val a = Profile.profile(df).collect().map(_.toSeq).toSet
    val b = Profile.profile(df.repartition(7)).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === df.schema.fields.length)
  }

  test("histogram: exact bin counts, top edge clamps into the last bin") {
    import spark.implicits._
    // values 0..100 over [0, 100]: 4 bins of width 25; x = 100 clamps
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = Profile.histogram(df, "v", 4)
      .select($"bin", $"lo", $"hi", $"n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(h.map(r => r._1 -> r._4).toSeq ===
      Seq(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 26L))
    assert(h.head._2 === 0.0 && h.last._3 === 100.0)
    // total preserved, bins partition the data
    assert(h.map(_._4).sum === 101L)
    // layout invariance
    val again = Profile.histogram(df.repartition(9), "v", 4)
      .select($"bin", $"n").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === h.map(r => (r._1, r._4)).toSeq)
  }
}
