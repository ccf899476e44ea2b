package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality expectations (the dbt-test / Great-
  * Expectations family, engine-native): each rule reduces to a violation
  * count, and rules over the same table FUSE into one conditional
  * aggregate — a 100 TB table pays ONE scan for its whole rule set, not
  * one scan per rule. Referential rules are the exception (they need the
  * other table) and run as a single anti-join count each.
  *
  * Output contract: one row per rule — (rule, n_checked, n_violations,
  * pass) — exact integers, so the report is hash-gateable and diffable
  * between pipeline runs.
  */
object DataQuality {

  /** A fused same-table rule: name + the row-level violation predicate. */
  final case class Rule(name: String, violation: org.apache.spark.sql.Column)

  /** One scan, `rules.size` conditional sums. */
  def checkRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val agg = df.agg(count(lit(1)).as("n_checked"),
      rules.map(r => sum(when(r.violation, 1L).otherwise(0L))
        .as(s"v_${r.name}")): _*)
    // unpivot the single bounded row into the per-rule report
    val stacked = rules.map(r =>
      s"'${r.name}', v_${r.name}").mkString(", ")
    agg.select(col("n_checked"),
      expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"))
      .select(col("rule"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }

  /** Referential-integrity rule: count child rows whose `childKey` has no
    * match in `parent.parentKey` (one LEFT ANTI + count — the bloom-
    * prefiltered form in [[BloomPrune]] is the drop-in at huge scale).
    */
  def checkForeignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val n = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    n.crossJoin(orphans)
      .select(lit(name).as("rule"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }

  /** Uniqueness rule: duplicate rows beyond the first per key. */
  def checkUnique(df: DataFrame, keyCol: String, name: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_checked"),
        sum(col("c") - 1).as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))

  /** Gate: the star schema's core contract — null/range/domain rules fused
    * into one lineitem scan, plus FK integrity and key uniqueness.
    */
  def starSchemaExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val fused = checkRules(li, Seq(
      Rule("li_orderkey_not_null", col("l_orderkey").isNull),
      Rule("li_quantity_range", col("l_quantity") < 1 || col("l_quantity") > 50),
      Rule("li_discount_range", col("l_discount") < 0 || col("l_discount") > 1),
      Rule("li_returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
      Rule("li_price_positive", col("l_extendedprice") <= 0)))
    fused
      .unionByName(checkForeignKey(li, "l_orderkey",
        Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey")),
        "l_orderkey", "li_orderkey_fk"))
      .unionByName(checkForeignKey(li, "l_partkey",
        Tables.part(spark, sfDir).select(col("p_partkey").as("l_partkey")),
        "l_partkey", "li_partkey_fk"))
      .unionByName(checkUnique(Tables.orders(spark, sfDir), "o_orderkey",
        "orders_key_unique"))
      .orderBy("rule")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expectations" -> (starSchemaExpectations _))

  val oracles: Map[String, String] = Map(
    "q_expectations" -> """
      |WITH li AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
      |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
      |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
      |  FROM lineitem),
      |fko AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
      |fkp AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem
      |  WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)),
      |ou AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v FROM orders),
      |rep AS (
      |  SELECT 'li_orderkey_not_null' AS rule, n AS n_checked, v_null AS n_violations FROM li
      |  UNION ALL SELECT 'li_quantity_range', n, v_qty FROM li
      |  UNION ALL SELECT 'li_discount_range', n, v_disc FROM li
      |  UNION ALL SELECT 'li_returnflag_domain', n, v_flag FROM li
      |  UNION ALL SELECT 'li_price_positive', n, v_price FROM li
      |  UNION ALL SELECT 'li_orderkey_fk', (SELECT n FROM li), v FROM fko
      |  UNION ALL SELECT 'li_partkey_fk', (SELECT n FROM li), v FROM fkp
      |  UNION ALL SELECT 'orders_key_unique', n, v FROM ou)
      |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
      |FROM rep ORDER BY rule""".stripMargin)
}
