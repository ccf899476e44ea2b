package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime re-plan path for hot keys (the
  * complement of the static salting in `q_salted_revenue`). Thresholds are
  * lowered so the 90%-hot-key join trips the optimizer at test scale.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed partition and keeps the join correct") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 90% on key 0 → one fat shuffle partition
      val left = spark.range(200000)
        .select(when($"id" % 10 =!= 0, 0L).otherwise($"id").as("k"),
          concat(lit("payload_"), $"id").as("pad"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan its own) so the AQE
      // final plan is inspectable
      val qe = joined.queryExecution
      val n = qe.toRdd.count()
      // 180000 hot-key rows + the 100 id%10==0 rows whose key < 1000
      assert(n === 180100L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.toLowerCase.contains("skew"), plan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
