package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000)

  test("lagAutocorrelation: periodicity detected exactly, nulls on flat series") {
    // key 1: strict period-2 alternation 1,-1,1,-1 … -> r(lag 1) = -1,
    // r(lag 2) = +1 exactly (the quantized moments make these literal)
    val alt = (0 until 40).map(i =>
      (1L, 100L + i, ts((i + 1) * 1000000L), if (i % 2 == 0) 1.0 else -1.0))
    // key 2: constant series -> zero variance -> r null
    val flat = (0 until 10).map(i => (2L, 200L + i, ts((i + 1) * 1000000L), 5.0))
    val events = (alt ++ flat).toDF("user_id", "event_id", "ts", "value")
    val lag1 = TimeSeries.lagAutocorrelation(events, "user_id", "ts",
        "event_id", "value", 1)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(lag1(1L)._3 === 39L)
    // the points lie exactly on y = -x, so r = -1 up to the one
    // sqrt(dx)·sqrt(dx) rounding (±1 ulp); the GATE checks bit parity
    // cross-engine, this spec checks the statistics
    assert(math.abs(lag1(1L)._4.get - (-1.0)) < 1e-12)
    assert(lag1(2L)._4 === None)
    val lag2 = TimeSeries.lagAutocorrelation(events, "user_id", "ts",
        "event_id", "value", 2)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(math.abs(lag2(1L)._4.get - 1.0) < 1e-12)
    // partition invariance: moments are integer sums on the grid
    val again = TimeSeries.lagAutocorrelation(events.repartition(13),
        "user_id", "ts", "event_id", "value", 1)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(again === lag1.values.toSet)
  }

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

  test("resample: NULL-valued events are non-observations (gaps), not emitted values") {
    val step = 10L * 1000 * 1000
    // bucket 1 holds ONLY a null-valued event: it must resample as a GAP
    // (LOCF carries 10.0 across; lerp interpolates 10→40), and a trailing
    // null in bucket 0 must not shadow the real 10.0 observation
    val events = Seq(
      (1L, 100L, ts(1L * 1000 * 1000), Some(10.0)),  // bucket 0
      (1L, 101L, ts(9L * 1000 * 1000), None),        // bucket 0, later ts, null
      (1L, 102L, ts(15L * 1000 * 1000), None),       // bucket 1, null only
      (1L, 103L, ts(35L * 1000 * 1000), Some(40.0))) // bucket 3
      .toDF("user_id", "event_id", "ts", "value")
    val locf = TimeSeries.resampleLocf(events, "user_id", "ts", "event_id",
        "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(_._2)
    assert(locf.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(locf(0)._5 === 10.0 && locf(0)._4 === 1L, "null obs must not win the bucket")
    assert(locf(1) === ((1L, 1L, step, 0L, 10.0, true)), "null-only bucket is a gap")
    assert(locf(2)._5 === 10.0 && locf(2)._6)
    assert(locf(3)._5 === 40.0 && !locf(3)._6)
    val lerp = TimeSeries.resampleLerp(events, "user_id", "ts", "event_id",
        "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(_._2)
    assert(lerp(1)._5 === 20.0 && lerp(2)._5 === 30.0, "nulls interpolate across")
  }

  test("resampleLerp: straight-line fill between observed buckets") {
    val step = 10L * 1000 * 1000
    // key 1: obs 10.0 at bucket 0 and 40.0 at bucket 3 — gaps at 1, 2
    // interpolate to 20.0, 30.0; key 2 single bucket passes through
    val events = Seq(
      (1L, 100L, ts(1L * 1000 * 1000), 10.0),
      (1L, 102L, ts(35L * 1000 * 1000), 40.0),
      (2L, 200L, ts(50L * 1000 * 1000), 7.5))
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.resampleLerp(events, "user_id", "ts", "event_id",
        "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(k1.map(_._5).toSeq === Seq(10.0, 20.0, 30.0, 40.0))
    assert(k1.map(_._6).toSeq === Seq(false, true, true, false))
    val k2 = out.filter(_._1 == 2L)
    assert(k2.length === 1 && k2(0)._5 === 7.5 && !k2(0)._6)
  }

  test("resampleLerp: observed buckets keep their exact value; partition-invariant") {
    val step = 1000L * 1000
    val rnd = new scala.util.Random(3)
    val events = (1 to 400).map { i =>
      (i % 5L, i.toLong, ts(rnd.nextInt(60) * 1000000L + i), rnd.nextDouble() * 100)
    }.toDF("user_id", "event_id", "ts", "value")
    val a = TimeSeries.resampleLerp(events, "user_id", "ts", "event_id", "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSet
    val b = TimeSeries.resampleLerp(events.repartition(7), "user_id", "ts",
        "event_id", "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSet
    assert(a === b, "identical bits on any input partitioning")
    // gap rows sit between their neighbors' values (line segment property)
    val locf = TimeSeries.resampleLocf(events, "user_id", "ts", "event_id", "value", step)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect()
    val obsByKey = locf.filter(!_._6).groupBy(_._1)
    a.filter(_._6).foreach { g =>
      val obs = obsByKey(g._1).map(r => (r._2, r._5)).sortBy(_._1)
      val pv = obs.filter(_._1 < g._2).last._2
      val nv = obs.find(_._1 > g._2).get._2
      assert(g._5 >= math.min(pv, nv) - 1e-9 && g._5 <= math.max(pv, nv) + 1e-9)
    }
  }

  test("hoppingWindowAgg ≡ Spark window() groupBy, batch and streaming") {
    import org.apache.spark.sql.streaming.Trigger
    val size = "6 hours"
    val slide = "2 hours"
    val ev = graft.Tables.events(spark, sf0001)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Double)].collect().toSet

    val mine = norm(TimeSeries.hoppingWindowAgg(ev, "event_type", "ts",
      "value", TimeSeries.GateHopSizeMicros, TimeSeries.GateHopSlideMicros)
      .select($"window_start", $"grp", $"n", $"total"))

    def sparkWindowed(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window($"ts", size, slide), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).cast("double").as("total"))
        .select(unix_micros($"window.start").as("window_start"),
          $"event_type", $"n", $"total")

    assert(mine === norm(sparkWindowed(ev)),
      "integer-arithmetic hopping windows must equal Spark's window()")

    val q = sparkWindowed(eventsStream("graft-hop-events"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hop_stream")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.processAllAvailable()
      assert(mine === norm(spark.table("hop_stream")),
        "streaming twin diverged from the batch hopping windows")
    } finally q.stop()
  }

  test("rollingAnomalies flags a planted outlier against its trailing window") {
    // steady value 10.0 with jitter, one spike at the end
    val vals = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.2, 9.8, 100.0)
    val events = vals.zipWithIndex.map { case (v, i) =>
      (1L, "purchase", i.toLong, ts(i.toLong * 1000000), v)
    }.toDF("user_id", "event_type", "event_id", "ts", "value")
    val out = TimeSeries.rollingAnomalies(events,
        Seq("user_id", "event_type"), "ts", "event_id", "value",
        win = 20, minObs = 5)
      .orderBy("us")
      .select("event_id", "n_win", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect()
    // warm-up: rows 0..4 have < 5 trailing obs -> no z
    assert(out.take(5).forall(r => r._3.isEmpty && !r._4))
    // the spike is scored against the stable window and flagged
    val spike = out.last
    assert(spike._1 === 8L && spike._2 === 8L)
    assert(spike._3.exists(_ > 3.0) && spike._4)
    // the stable rows in between are not flagged
    assert(out.drop(5).dropRight(1).forall(!_._4))
  }

  test("rollingAnomalies: zero-variance window yields null z, never infinity") {
    val events = (0 until 10).map(i =>
      (1L, "x", i.toLong, ts(i.toLong * 1000000), 5.0))
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val out = TimeSeries.rollingAnomalies(events,
        Seq("user_id", "event_type"), "ts", "event_id", "value",
        win = 20, minObs = 3)
      .select("z", "is_anomaly").as[(Option[Double], Boolean)].collect()
    assert(out.forall(r => r._1.isEmpty && !r._2))
  }

  test("rollingAnomalies is partition-invariant (decimal window moments)") {
    val rnd = new scala.util.Random(11)
    val events = (0 until 400).map { i =>
      (i % 7L, if (i % 2 == 0) "a" else "b", i.toLong,
        ts(i.toLong * 777777), rnd.nextDouble() * 50)
    }.toDF("user_id", "event_type", "event_id", "ts", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.rollingAnomalies(df, Seq("user_id", "event_type"), "ts",
        "event_id", "value")
        .orderBy("user_id", "event_type", "us")
        .as[(Long, String, Long, Long, Double, Long, Option[Double], Boolean)]
        .collect().toSeq
    assert(run(events.coalesce(1)) === run(events.repartition(17)))
  }

  test("trendOls recovers a planted line exactly; degenerate keys yield nulls") {
    val t0 = 1700000000000000L
    def ts(min: Long) = new java.sql.Timestamp((t0 + min * 60000000L) / 1000)
    // user 1: y = 2.5x + 7 sampled at x = 0, 3, 10, 14 minutes — exact on
    // the decimal grid, so OLS must recover slope/intercept EXACTLY
    val line = Seq(0L, 3L, 10L, 14L).map(x => (1L, ts(x), 2.5 * x + 7.0))
    // user 2: single observation → zero x-variance → null fit
    val degenerate = Seq((2L, ts(0L), 42.0))
    // user 3: two same-time observations → den = 0 as well
    val sameTime = Seq((3L, ts(5L), 1.0), (3L, ts(5L), 2.0))
    val df = (line ++ degenerate ++ sameTime).toDF("user_id", "ts", "value")
    val got = TimeSeries.trendOls(df, "user_id", "ts", "value")
      .select($"user_id", $"slope", $"intercept")
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(2.5), Some(7.0))))
    assert(got(2L) === ((None, None)))
    assert(got(3L) === ((None, None)))
    // layout invariance: exact integer moments make the fit partition-free
    val again = TimeSeries.trendOls(df.repartition(7), "user_id", "ts", "value")
      .select($"user_id", $"slope", $"intercept")
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again === got)
  }

  test("ewma: integer num/den match a driver fold; approximates the true recurrence") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val xs = (0 until 60).map(i => math.sin(i * 0.7) * 100 + i)
    val df = xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, new java.sql.Timestamp(ts0.getTime + i * 60000L), v)
    }.toDF("user_id", "event_id", "ts", "value")
    val got = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value")
      .orderBy("us").select("ewma_num", "ewma_den", "ewma")
      .as[(Long, Long, Double)].collect().toSeq
    // driver fold over the same quantized grid
    val xq = xs.map(v =>
      (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact)
    got.zipWithIndex.foreach { case ((num, den, e), i) =>
      val ks = (0 to math.min(i, TimeSeries.EwmaLags - 1))
      val wantNum = ks.map(k => xq(i - k) * (1L << (TimeSeries.EwmaLags - 1 - k))).sum
      val wantDen = ks.map(k => 1L << (TimeSeries.EwmaLags - 1 - k)).sum
      assert((num, den) === (wantNum, wantDen))
      assert(e === num.toDouble / den.toDouble / 10000.0)
      // truncated-tail EWMA tracks the true α=1/2 recurrence: the dropped
      // tail weighs 2^-EwmaLags of a bounded signal
      if (i >= TimeSeries.EwmaLags) {
        val trueEwma = xs.take(i + 1).reduceLeft((s, x) => 0.5 * x + 0.5 * s)
        assert(math.abs(e - trueEwma) < 1e-2, s"row $i: $e vs $trueEwma")
      }
    }
    // partition-layout invariance
    val a = TimeSeries.ewma(df.repartition(7), "user_id", "ts", "event_id", "value")
      .orderBy("us").select("ewma_num").as[Long].collect().toSeq
    assert(a === got.map(_._1))
  }
}
