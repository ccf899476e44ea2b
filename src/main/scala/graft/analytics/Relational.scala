package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational/bench surface over the TPC-H-ish testdata (TESTDATA.md).
  *
  * These queries exist because the reference's own surface has almost no
  * relational operators (SURVEY.md §2.3-2.7 "absent" rows): joins beyond the
  * single enrichment join `manager.py:943-995`, ORDER BY/LIMIT, set ops,
  * grouping sets and windows are all required engine capabilities the target
  * gets from Spark built-ins. Each query is written Catalyst-first: filters
  * and projections sit directly on the parquet scan so pushdown/pruning
  * happen, joins broadcast the small side explicitly, and aggregates over
  * double columns run through exact decimal casts so results are
  * deterministic bit-for-bit (oracle hash parity; summation order of doubles
  * is otherwise nondeterministic in a distributed plan).
  */
object Relational {

  /** Exact deterministic sum of a double column: cast to decimal, sum
    * (exact, order-independent), cast back to double. Same construction as
    * the DuckDB oracle, so both engines round the identical exact value to
    * the identical double. Scale rule: at least (decimal content of the
    * data) + 2, while keeping |x|*10^scale far below 2^52 so the
    * double->decimal conversion is error-free; testdata money columns are
    * exact 2-decimal values with |x| <= ~5e5.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")
  private def dsum6(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")
  private def dsum8(c: Column): Column = sum(c.cast("decimal(24,8)")).cast("double")

  /** TPC-H Q1 analog: pricing summary by returnflag/linestatus.
    * Single scan, partial (map-side) aggregation, 2-key groupBy — the shape
    * that scales: no join, shuffle only of pre-aggregated partials.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum8(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
