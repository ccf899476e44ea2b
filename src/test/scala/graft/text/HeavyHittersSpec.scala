package graft.text

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch retains every item above the n/(cap+1) guarantee") {
    // adversarial stream: one heavy item interleaved with distinct noise
    val stream = (1 to 1000).flatMap(i => Seq("heavy", s"noise$i"))
    val sketch = stream.foldLeft(mutable.HashMap.empty[String, Long])(
      (m, x) => HeavyHitters.mgUpdate(m, x, cap = 10))
    assert(sketch.contains("heavy"), "freq 1000/2000 > n/11 must survive")
    assert(sketch.size <= 10)
  }

  test("MG merge preserves the guarantee across partial sketches") {
    // the heavy item is NOT heavy in either half alone relative to cap,
    // but is globally; merged sketch must keep it
    val a = mutable.HashMap("x" -> 30L, "a1" -> 25L, "a2" -> 25L)
    val b = mutable.HashMap("x" -> 30L, "b1" -> 25L, "b2" -> 25L)
    val merged = HeavyHitters.mgMerge(a, b, cap = 3)
    assert(merged.contains("x"))
    assert(merged.size <= 3)
  }

  test("frequentItems equals the exact full-groupBy answer on skewed data") {
    // zipf-ish: item i appears 1000/i times, i = 1..200, shuffled across
    // partitions
    val data = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val ds = spark.createDataset(data).repartition(13)
    val k = 50
    val got = HeavyHitters.frequentItems(ds, k)
      .as[(String, Long)].collect().toSet
    val n = data.size
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("frequentItems is empty when nothing crosses the threshold") {
    val ds = spark.createDataset((1 to 500).map(i => s"u$i"))
    assert(HeavyHitters.frequentItems(ds, 100).count() === 0L)
  }

  test("exact pass shuffles only candidates plus the other-bucket") {
    val ds = spark.createDataset(
      (1 to 20).flatMap(i => Seq.fill(i * i)(s"t$i"))).repartition(7)
    val df = HeavyHitters.frequentItems(ds, 10)
    val plan = df.queryExecution.executedPlan.toString
    // partial aggregation must appear below the exchange (map-side combine
    // collapses each partition to ≤2k+1 rows before any shuffle)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    val got = df.as[(String, Long)].collect().toMap
    val n = (1 to 20).map(i => i * i).sum
    val want = (1 to 20).filter(i => i.toLong * i * 10 > n)
      .map(i => s"t$i" -> (i.toLong * i)).toMap
    assert(got === want)
    assert(want.nonEmpty)
  }
}
