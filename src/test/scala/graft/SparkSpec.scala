package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"

  /** Copy the testdata events parquet into a fresh directory (file stream
    * sources need a directory) and open it as a stream with `ts` normalized
    * to TimestampType. The explicit schema a file stream requires is taken
    * from a batch read of the same file, so the helper works for both the
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS,NTZ) encodings the generator has
    * shipped (see [[graft.Tables.normalizeEventTs]]).
    */
  def eventsStream(prefix: String): org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evDir = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      evDir.resolve("events.parquet"))
    val fileSchema = spark.read.parquet(evDir.toString).schema
    Tables.normalizeEventTs(
      spark.readStream.schema(fileSchema).parquet(evDir.toString))
  }
}

object SparkSpec {
  // one session per JVM: suites share it, which keeps `sbt test` fast
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
