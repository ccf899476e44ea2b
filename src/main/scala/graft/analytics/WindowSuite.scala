package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Named-window-function coverage the other gates don't exercise: explicit
  * ROWS frames (running and trailing), FIRST_VALUE/LAST_VALUE with full
  * frames, LEAD, and NTILE — per-customer over the orders stream. The
  * ordering key (o_orderdate, o_orderkey) is a total order, which is what
  * makes every frame's content (and therefore the hash) deterministic on
  * any partitioning; money sums run through decimals ([[Relational]]
  * exactness playbook). One shuffle: all six columns share the per-customer
  * window partition.
  */
object WindowSuite {

  def orderWindowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trail = base.rowsBetween(-2, Window.currentRow)
    val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dec = col("o_totalprice").cast("decimal(18,4)")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total", sum(dec).over(run).cast("double"))
      .withColumn("trail3_total", sum(dec).over(trail).cast("double"))
      .withColumn("trail3_n", count(lit(1)).over(trail))
      .withColumn("first_order", first(col("o_orderkey")).over(run))
      .withColumn("last_order", last(col("o_orderkey")).over(full))
      .withColumn("next_order", lead(col("o_orderkey"), 1).over(base))
      .withColumn("quartile", ntile(4).over(base).cast("long"))
      .drop("o_totalprice")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_frames" -> (orderWindowStats _))

  val oracles: Map[String, String] = Map(
    "q_window_frames" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (w ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS running_total,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (w ROWS 2 PRECEDING) AS VARCHAR) AS DOUBLE) AS trail3_total,
        |  CAST(COUNT(*) OVER (w ROWS 2 PRECEDING) AS BIGINT) AS trail3_n,
        |  FIRST_VALUE(o_orderkey) OVER (w ROWS UNBOUNDED PRECEDING) AS first_order,
        |  LAST_VALUE(o_orderkey) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        |  LEAD(o_orderkey, 1) OVER w AS next_order,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)
}
