package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("planted violations are counted exactly; clean data passes") {
    val rows = Seq[(java.lang.Long, Double)](
      (1L, 5.0), (2L, -1.0), (null, 10.0), (4L, 200.0), (5L, 7.0))
      .toDF("k", "v")
    val rep = DataQuality.checkRules(rows, Seq(
      DataQuality.Rule("k_not_null", $"k".isNull),
      DataQuality.Rule("v_range", $"v" < 0 || $"v" > 100)))
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(rep("k_not_null") === ("k_not_null", 5L, 1L, false))
    assert(rep("v_range") === ("v_range", 5L, 2L, false))

    val parent = Seq(1L, 2L, 4L).toDF("pk")
    val fk = DataQuality.checkForeignKey(
      rows.filter($"k".isNotNull), "k", parent, "pk", "fk")
      .as[(String, Long, Long, Boolean)].head()
    assert(fk === ("fk", 4L, 1L, false)) // k=5 is the orphan

    val dup = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val uq = DataQuality.checkUnique(dup, "k", "uq")
      .as[(String, Long, Long, Boolean)].head()
    assert(uq === ("uq", 6L, 3L, false))

    val clean = DataQuality.checkRules(Seq((1L, 5.0)).toDF("k", "v"),
      Seq(DataQuality.Rule("ok", lit(false))))
      .as[(String, Long, Long, Boolean)].head()
    assert(clean === ("ok", 1L, 0L, true))
  }

  test("fused same-table rules cost one scan") {
    val plan = DataQuality.checkRules(
      graft.Tables.lineitem(spark, sf0001), Seq(
        DataQuality.Rule("a", col("l_quantity") < 0),
        DataQuality.Rule("b", col("l_discount") < 0),
        DataQuality.Rule("c", col("l_orderkey").isNull)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected one fused scan, plan:\n${plan.take(1500)}")
  }
}
