package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Global ranking WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole dataset into
  * ONE task — the canonical 100 TB cluster-killer (Spark even warns). The
  * scale-correct form is the classic two-pass layout:
  *
  *   1. range-repartition + sort within partitions on the rank keys
  *      (the same machinery as a distributed ORDER BY),
  *   2. count rows per partition — a metadata-sized aggregate (one long per
  *      partition) collected to the driver,
  *   3. prefix-sum those counts into per-partition offsets, broadcast back,
  *   4. partition-local row_number + offset = the exact global row number.
  *
  * Equivalent to `zipWithIndex` but staying in the DataFrame API end-to-end
  * so column pruning/codegen survive. The driver never sees data rows —
  * only the partition-count vector (numPartitions longs).
  */
object Ranking {

  /** Exact global row numbers (1-based) by `keys` order. The caller must
    * pass a TOTAL order (append a unique tiebreak column) — required for a
    * deterministic result on any partitioning, and what makes downstream
    * rank statistics engine-exact.
    */
  def globalRowNumber(df: DataFrame, keys: Seq[Column],
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint PINS the range boundaries: the count pass and the
    // numbering pass are separate jobs, and without the pin each would
    // re-sample range boundaries from a possibly-different upstream (AQE
    // re-plans between jobs) — mismatched partitions would corrupt every
    // offset. The checkpoint holds exactly the sorted input, nothing more.
    val sorted = df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .transform(graft.plans.Lineage.cut)
    // metadata-sized action: one (pid, count) row per partition
    val counts = sorted.select(spark_partition_id().as("__pid"))
      .groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, p) =>
      acc + counts.getOrElse(p, 0L)
    }.toArray
    // numbering is a NARROW partition-local pass (iterator order == sort
    // order) — no second exchange; a window on the partition id would
    // re-shuffle the full dataset through hash(pid)
    val schema = sorted.schema.add("rn", org.apache.spark.sql.types.LongType,
      nullable = false)
    sorted.mapPartitions { it =>
      var i = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        i += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Exact global running (inclusive) prefix sum of `weight` in `keys`
    * order — [[globalRowNumber]] generalized from counts to weights, same
    * three-pass shape: range-repartition + local sort, a metadata-sized
    * per-partition weight-sum collect, broadcast offsets, then one narrow
    * partition-local accumulation. Powers weighted layout decisions
    * (systematic/PPS sampling, size-balanced sharding) that would
    * otherwise need a single-partition window. `keys` must be a total
    * order; `weight` must be a non-negative integral column.
    */
  def globalPrefixSum(df: DataFrame, keys: Seq[Column], weight: Column,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.withColumn("__w", weight.cast("long"))
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .transform(graft.plans.Lineage.cut)
    val sums = sorted.select(spark_partition_id().as("__pid"), col("__w"))
      .groupBy(col("__pid")).agg(sum(col("__w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, p) =>
      acc + sums.getOrElse(p, 0L)
    }.toArray
    val wIdx = sorted.schema.fieldIndex("__w")
    val schema = sorted.schema.add("cumw", org.apache.spark.sql.types.LongType,
      nullable = false)
    sorted.mapPartitions { it =>
      var c = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        c += r.getLong(wIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ c)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Rank statistics over per-customer order value: global row number,
    * percent_rank, cume_dist, and decile — all derived from [[globalRowNumber]]
    * by exact arithmetic (the sort key is unique, so rank == row_number and
    * every formula below matches the engine-native window functions the
    * oracle uses). Decile uses the equal-spread form
    * `(rn-1)*10 div n + 1`, spelled out identically in the oracle (NTILE's
    * front-loaded remainder is a different convention).
    */
  def customerValueRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val totals = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
        .as("total"))
    val ranked = globalRowNumber(totals, Seq(col("total"), col("o_custkey")))
    val nAll = ranked.agg(count(lit(1)).as("n_all"))
    ranked.crossJoin(broadcast(nAll))
      .select(col("o_custkey"), col("total"), col("rn"),
        ((col("rn") - 1) / (col("n_all") - 1)).as("pr"),
        (col("rn") / col("n_all")).as("cd"),
        (expr("(rn - 1) * 10 div n_all") + 1).as("decile"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_global_ranks" -> ((s, d) =>
      customerValueRanks(s, d).orderBy("o_custkey")))

  /** The oracle computes the SAME statistics with DuckDB's native window
    * functions — global row_number/percent_rank/cume_dist over the unique
    * (total, custkey) order — which is exactly what [[globalRowNumber]]
    * replaces at scale.
    */
  val oracles: Map[String, String] = Map(
    "q_global_ranks" -> """
      |WITH t AS (SELECT o_custkey,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT o_custkey, total,
      |    CAST(row_number() OVER w AS BIGINT) AS rn,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_all
      |  FROM t WINDOW w AS (ORDER BY total, o_custkey))
      |SELECT o_custkey, total, rn, pr, cd,
      |  (rn - 1) * 10 // n_all + 1 AS decile
      |FROM r ORDER BY o_custkey""".stripMargin)
}
