package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental view maintenance for SUM/COUNT group-by summaries over a
  * [[VersionedTable]]: instead of recomputing `SELECT g, count(*),
  * sum(v) GROUP BY g` after every mutation, fold the version-to-version
  * [[VersionedTable.changeFeedRows]] into the existing summary — classic
  * delta-propagation IVM (count-sum aggregates are self-maintainable;
  * public textbook technique).
  *
  * Every feed row contributes up to two signed deltas: `(-1, old)` when an
  * old row existed and `(+1, new)` when a new one does — which makes
  * GROUP-MOVING updates (a row whose group column itself changed) correct
  * for free: the old group loses the old value, the new group gains the
  * new one. Deltas aggregate per group (one shuffle over FEED-sized data,
  * never table-sized), then a single full-outer join applies them to the
  * summary; groups whose count reaches zero drop out.
  *
  * Determinism: the value sum is exact decimal(18,4) addition end to end —
  * the maintained sum is bit-identical to the recomputed one (specs assert
  * equality, the gate's oracle recomputes from scratch relationally), not
  * merely close. At 100 TB the summary table is itself versioned-table
  * material: maintain it with [[VersionedTable.overwrite]] keyed by the
  * upstream version for exactly-once semantics.
  */
object Ivm {

  /** Build the initial summary: (groupCols..., cnt, sum_v as
    * decimal(18,4)).
    */
  def summarize(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_v"))

  /** Apply one change feed ([[VersionedTable.changeFeedRows]] output) to a
    * summary produced by [[summarize]] with the same groupCols/valueCol.
    */
  def applyDelta(summary: DataFrame, feed: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val contribs = feed.select(explode(array(
        struct(lit(-1L).as("sign"), col("old").as("row")),
        struct(lit(1L).as("sign"), col("new").as("row")))).as("c"))
      .filter(col("c.row").isNotNull)
      .select((groupCols.map(g => col(s"c.row.$g").as(g)) :+
        col("c.sign").as("sign") :+
        col(s"c.row.$valueCol").cast("decimal(18,4)").as("v")): _*)
    val deltas = contribs.groupBy(groupCols.map(col): _*)
      .agg(sum(col("sign")).as("d_cnt"),
        sum(col("sign") * col("v")).as("d_sum"))
    summary.join(deltas, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt") :+
        (coalesce(col("sum_v"), lit(0).cast("decimal(18,4)")) +
          coalesce(col("d_sum"), lit(0).cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("sum_v")): _*)
      .filter(col("cnt") > 0)
  }

  /** Gate: the [[VersionedTable.mergeSnapshotGate]] mutation chain with a
    * per-brand revenue summary maintained INCREMENTALLY from each
    * version's change feed — never recomputed — and read out at the end.
    * The oracle recomputes the final summary relationally from scratch;
    * agreement of the two algorithms (delta propagation vs recompute) is
    * the check.
    */
  def ivmSummaryGate(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-ivm-gate")
      .toString + "/t"
    val part = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_retailprice")
    VersionedTable.create(spark, root, part.filter(col("p_partkey") % 3 === 0))
    var summary = summarize(VersionedTable.read(spark, root),
      Seq("p_brand"), "p_retailprice").localCheckpoint()

    def step(commit: => Long): Unit = {
      val v = commit
      summary = applyDelta(summary,
        VersionedTable.changeFeedRows(spark, root, v - 1, v, "p_partkey"),
        Seq("p_brand"), "p_retailprice").localCheckpoint()
    }
    step(VersionedTable.append(spark, root, part.filter(col("p_partkey") % 3 === 1)))
    step(VersionedTable.merge(spark, root,
      part.filter(col("p_partkey") % 5 === 0)
        .withColumn("p_retailprice", col("p_retailprice") + lit(1000.0)),
      "p_partkey"))
    step(VersionedTable.deleteByKeys(spark, root,
      part.filter(col("p_partkey") % 7 === 0).select("p_partkey"), "p_partkey"))
    summary.select(col("p_brand"), col("cnt"),
        col("sum_v").cast("double").as("sum_price"))
      .orderBy("p_brand")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vt_ivm_summary" -> (ivmSummaryGate _))

  val oracles: Map[String, String] = Map(
    "vt_ivm_summary" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_retailprice FROM part),
        |base AS (SELECT * FROM p WHERE p_partkey % 3 IN (0, 1)),
        |upd AS (SELECT p_partkey, p_brand, p_retailprice + 1000.0 AS p_retailprice
        |        FROM p WHERE p_partkey % 5 = 0),
        |m AS (SELECT * FROM base WHERE p_partkey % 5 <> 0
        |      UNION ALL SELECT * FROM upd),
        |f AS (SELECT * FROM m WHERE p_partkey % 7 <> 0)
        |SELECT p_brand, COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM f GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
