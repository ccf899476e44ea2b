package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators: Z-order (Morton) clustering for multi-dimensional
  * scan pruning. At 100 TB the dominant cost of a selective two-column
  * predicate (`part between .. and supplier between ..`) is how many files
  * the scan must open; sorting by one column prunes that column only.
  * Writing files in Z-value order keeps BOTH columns' min/max file
  * statistics tight, so parquet row-group / file skipping prunes on every
  * interleaved dimension at once — the layout trick behind
  * OPTIMIZE ... ZORDER BY in lakehouse engines, built here from plain
  * column arithmetic + repartitionByRange.
  */
object Layout {

  /** Bits per dimension interleaved into the Z-value by the gate. */
  val GateBits = 10

  /** Morton Z-value: interleave the low `bits` of two non-negative longs —
    * bit i of `a` lands at Z bit 2i, bit i of `b` at 2i+1. Pure codegen'd
    * integer arithmetic (shift/and/add), no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }

  /** Re-layout `df` into `numFiles` range partitions of Z-value order over
    * the two dimension columns (masked to `bits`). Each output partition
    * covers a disjoint Z-range — a square-ish tile of the (a, b) plane —
    * so every file's min/max stats are tight on BOTH columns. One range
    * exchange (sampling pass + shuffle), the same cost as a global sort,
    * then files write in partition order.
    */
  def zorderBy(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, numFiles: Int = 32): DataFrame = {
    val mask = (1L << bits) - 1
    val z = zValue(col(aCol).cast("long").bitwiseAND(lit(mask)),
      col(bCol).cast("long").bitwiseAND(lit(mask)), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
  }

  /** Write `df` as a BUCKETED table: hash-clustered into `numBuckets` by
    * `bucketCols`, sorted within buckets on the same keys, at `path`. This
    * is the repeated-join amortization play at 100 TB: both fact tables
    * bucketed on the join key pay their exchange ONCE at write time, and
    * every subsequent join/aggregation on that key is exchange-free —
    * Spark's scan exposes the bucketing as a hash partitioning, so
    * SortMergeJoin needs no shuffle on either side (spec-asserted against
    * the physical plan). The lakehouse equivalent of co-located DynamoDB
    * adjacency, expressed as table layout.
    *
    * Bucketed tables require the catalog (`saveAsTable`); `path` makes it
    * an external table so the files live where the caller says.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, bucketCols: Seq[String]): Unit = {
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    ()
  }

  /** Gate: the Z-value arithmetic itself, per lineitem row over
    * (l_partkey, l_suppkey) masked to [[GateBits]] — value-checked against
    * the oracle's identical shift/and/add chain.
    */
  def zorderCells(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val mask = (1L << GateBits) - 1
    li.select(col("l_orderkey"), col("l_linenumber"),
      (col("l_partkey").bitwiseAND(lit(mask))).as("pa"),
      (col("l_suppkey").bitwiseAND(lit(mask))).as("sb"))
      .select(col("l_orderkey"), col("l_linenumber"),
        zValue(col("pa"), col("sb"), GateBits).as("z"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_cells" -> ((s, d) =>
      zorderCells(s, d).orderBy("l_orderkey", "l_linenumber")))

  /** The oracle's Z expression is GENERATED from the same bit positions the
    * Column fold uses — no hand-transcription to drift.
    */
  private def zSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($a // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($b // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(
    "q_zorder_cells" -> s"""
      |WITH m AS (SELECT l_orderkey, l_linenumber,
      |    l_partkey % ${1L << GateBits} AS pa,
      |    l_suppkey % ${1L << GateBits} AS sb
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, ${zSql("pa", "sb", GateBits)} AS z
      |FROM m ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
