package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-partition window on any partitioning") {
    val df = (0L until 5000L).map { i =>
      (i, (i * 2654435761L) % 97) // duplicate sort values, unique tiebreak id
    }.toDF("id", "v")
    val expected = df
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 17, 64)) {
      val got = Ranking.globalRowNumber(
        df.repartition(11), Seq(col("v"), col("id")), partitions = parts)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      assert(got === expected, s"diverged at partitions=$parts")
    }
  }

  test("globalRowNumber numbers 1..n contiguously with empty partitions present") {
    val tiny = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "s")
    // far more partitions than rows → most range partitions are empty
    val rn = Ranking.globalRowNumber(tiny, Seq(col("k")), partitions = 32)
      .select($"s", $"rn").as[(String, Long)].collect().toMap
    assert(rn === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    val empty = spark.emptyDataFrame.withColumn("k", lit(0L))
    assert(Ranking.globalRowNumber(empty, Seq(col("k"))).count() === 0L)
  }
}
