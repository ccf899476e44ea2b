package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000)

  test("resampleLocf: contiguous grid, LOCF fill, deterministic last-in-bucket") {
    val step = 10L * 1000 * 1000 // 10 s grid
    // key 1: obs in buckets 0, 0 (tie on bucket), 3; key 2: single bucket
    val events = Seq(
      (1L, 100L, ts(1L * 1000 * 1000), 10.0), // bucket 0
      (1L, 101L, ts(9L * 1000 * 1000), 20.0), // bucket 0, later ts -> wins
      (1L, 102L, ts(35L * 1000 * 1000), 99.0), // bucket 3
      (2L, 200L, ts(50L * 1000 * 1000), 7.5)) // bucket 5
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.resampleLocf(events, "user_id", "ts", "event_id",
        "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))

    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L), "contiguous grid 0..3")
    assert(k1.map(_._3).toSeq === Seq(0L, step, 2 * step, 3 * step))
    // bucket 0: two obs, the later one (20.0) is the bucket value
    assert(k1(0)._4 === 2L && k1(0)._5 === 20.0 && !k1(0)._6)
    // buckets 1,2 are gaps filled with 20.0
    assert(k1(1) === ((1L, 1L, step, 0L, 20.0, true)))
    assert(k1(2) === ((1L, 2L, 2 * step, 0L, 20.0, true)))
    assert(k1(3)._5 === 99.0 && !k1(3)._6)

    val k2 = out.filter(_._1 == 2L)
    assert(k2.length === 1 && k2(0)._2 === 5L && k2(0)._5 === 7.5 && !k2(0)._6)
  }

  test("resampleLocf: same-timestamp tie breaks on event id; partitioning-free") {
    val step = 1000L * 1000
    val events = Seq(
      (1L, 7L, ts(500000L), 1.0),
      (1L, 9L, ts(500000L), 2.0), // same us, higher eid -> wins
      (1L, 8L, ts(500000L), 3.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.resampleLocf(events, "user_id", "ts", "event_id",
        "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect()
    assert(out.length === 1 && out(0)._4 === 3L && out(0)._5 === 2.0)

    val big = (0L until 500L).map(i =>
      (i % 13, i, ts(i * 777777L), i.toDouble)).toDF("user_id", "event_id", "ts", "value")
    val a = TimeSeries.resampleLocf(big, "user_id", "ts", "event_id", "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    val b = TimeSeries.resampleLocf(big.repartition(7), "user_id", "ts",
        "event_id", "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(a.sameElements(b), "resample must not depend on partitioning")
    // every key's grid is contiguous and starts/ends on an observed bucket
    a.groupBy(_._1).foreach { case (_, rows) =>
      val bs = rows.map(_._2)
      assert(bs.toSeq === (bs.min to bs.max).toSeq)
      assert(!rows.head._6 && !rows.last._6)
    }
  }
}
