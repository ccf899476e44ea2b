package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)`; these
  * helpers centralize the parquet reads so filters/projections written on
  * top of them push down to the scan (Catalyst `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events table's `ts` column has shipped as both TIMESTAMP(NANOS)
    * (older generators — Spark 4 won't map parquet nanos to TimestampType,
    * so it surfaces as LONG under `nanosAsLong`) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (current — surfaces as TIMESTAMP_NTZ). Branch on
    * the loaded type and normalize to TimestampType either way; sessions run
    * with `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast preserves the
    * stored epoch micros exactly. Window/date_trunc semantics are unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Normalize an events-shaped `ts` column to TimestampType whatever the
    * file encoding surfaced as (shared by [[events]] and the streaming
    * specs, which read the same parquet through `readStream`).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // integer div — double division would lose precision on epoch nanos
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
