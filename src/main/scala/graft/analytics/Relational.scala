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
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast("decimal(24,6)")

  /** TPC-H Q3 analog: top-10 open orders by revenue. Only the *filtered*
    * customer dimension is broadcast; the orders⋈lineitem leg is a shuffle
    * join on `o_orderkey` (both fact tables grow with sf — broadcasting
    * either side OOMs the driver at 100×; AQE picks SMJ/shuffled-hash and
    * handles skew at runtime).
    */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 analog: revenue by nation through a 6-table join. Only the
    * genuinely fixed-size dims (region: 5 rows, nation: 25 rows) are
    * broadcast; customer and supplier grow with sf (~15 M / ~1 M rows at
    * sf100) so their joins are left to AQE — shuffle joins on their natural
    * keys, runtime-promoted to broadcast only when the side is actually
    * small. The co-membership condition (customer and supplier in the same
    * nation) is the classic Q5 twist.
    */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey") &&
        supp("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q7 analog: bilateral trade volume between two nations by ship
    * year. The nation dimension is filtered to the two names BEFORE the
    * join (each broadcast leg is 1 row), so the fact tables are pruned by
    * the broadcast hash sets at the scan side; the supplier↔customer
    * nation-pair condition reduces to excluding the two same-nation
    * combinations after the equi-joins. The year extraction is integer and
    * engine-portable.
    */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val n1 = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(n1), supp("s_nationkey") === n1("s_nk"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(n2), cust("c_nationkey") === n2("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenue).cast("double").as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q10 analog: top-20 customers by lost revenue on returned items
    * in one quarter. The orders quarter filter and the returnflag filter
    * both sit on the scans (pushed down); the customer join keys the final
    * aggregate — grouping by the customer attributes rides the same
    * shuffle as the key (functional dependency), and nation (25 rows) is
    * the only broadcast.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q4 analog: order count per priority where at least one line
    * item shipped late (> 90 days after the order date) — the grouped
    * EXISTS shape. The existence test is a LEFT SEMI join whose condition
    * crosses both sides (l_shipdate > o_orderdate + 90 days): Spark keys
    * the semi join on the equi part (orderkey) and evaluates the
    * inequality as the join residual, so the fact-to-fact leg stays a
    * hash/SMJ join — no per-order subquery, no duplicate counting however
    * many line items are late.
    */
  def q4LateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Window ranking: top-3 parts by revenue within each brand (the ORDER
    * BY/LIMIT + ranking window category the reference lacks, SURVEY §2.5/2.6).
    */
  private def partRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_name")
    // part grows with sf (~20 M rows at sf100) — no broadcast hint; AQE
    // promotes the join to broadcast at runtime only while it actually fits
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
  }

  def topPartsPerBrand(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    partRevenue(spark, sfDir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** The same ranking through the custom physical operator
    * ([[graft.plans.TopKPerKey]]): bounded heaps either side of the
    * exchange instead of the window's full per-group sort —
    * result-identical (shares the window form's oracle), and the plan that
    * survives billion-row groups.
    */
  def topPartsPerBrandOperator(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopKPerKey.topK(partRevenue(spark, sfDir),
        keys = Seq("p_brand"),
        orderBy = Seq(("revenue", false), ("p_partkey", true)), k = 3)
      .withColumnRenamed("rank", "rnk")
      .orderBy(col("p_brand"), col("rnk"))

  val topPartsSql: String =
    """SELECT p_brand, p_partkey, p_name, revenue, rnk FROM (
      |  SELECT p_brand, p_partkey, p_name,
      |    CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) DESC,
      |               p_partkey) AS rnk
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand, p_partkey, p_name)
      |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin

  /** Set ops (absent in the reference — SURVEY §2.7): customers that bought
    * in both halves of the order history (INTERSECT), only early (EXCEPT),
    * and the disjoint union tagged.
    */
  def setOpsCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val early = ord.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val late = ord.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val both = early.intersect(late).withColumn("cohort", lit("both"))
    val earlyOnly = early.except(late).withColumn("cohort", lit("early_only"))
    val lateOnly = late.except(early).withColumn("cohort", lit("late_only"))
    both.unionByName(earlyOnly).unionByName(lateOnly)
      .orderBy(col("cohort"), col("o_custkey"))
  }

  val setOpsSql: String =
    """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
      |UNION ALL
      |SELECT o_custkey, 'early_only' FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
      |UNION ALL
      |SELECT o_custkey, 'late_only' FROM (SELECT * FROM late EXCEPT SELECT * FROM early)
      |ORDER BY cohort, o_custkey""".stripMargin

  /** ROLLUP grouping sets (absent in reference — SURVEY §2.4): counts and
    * exact sums at (flag, status), (flag), and grand-total levels.
    */
  def rollupSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** As-of join (absent in reference; Spark lacks it natively): for every
    * purchase event, the user's most recent click at-or-before it. Built the
    * scalable way — union both sides, one window pass per key — rather than
    * an inequality join that explodes to |purchases|×|clicks| per user.
    * Oracle uses DuckDB's native ASOF JOIN, so the semantics are checked
    * against a reference implementation.
    */
  def asofPurchaseClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_q"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      // clicks sort before purchases at identical ts => ASOF's >= semantics
      .orderBy(col("ts"), col("is_q"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    purchases.unionByName(clicks)
      .withColumn("click_event_id",
        last(when(col("is_q") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("is_q") === 1)
      .select(col("event_id"), col("user_id"), col("click_event_id"))
      .orderBy(col("event_id"))
  }

  val asofSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS click_event_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Range join: events bucketed into value bands derived from the region
    * table. Small side broadcasts → BroadcastNestedLoopJoin, the right plan
    * when one side is tiny; at scale with two big sides this becomes a
    * bucketed band join (see SURVEY §2.3 absent-joins note).
    */
  def rangeJoinValueBands(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = Tables.region(spark, sfDir)
      .select(col("r_regionkey").cast("long").as("band"),
        (col("r_regionkey") * 100.0).as("lo"),
        ((col("r_regionkey") + 1) * 100.0).as("hi"))
    Tables.events(spark, sfDir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"), "inner")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy(col("band"))
  }

  val rangeJoinSql: String =
    """WITH bands AS (SELECT CAST(r_regionkey AS BIGINT) AS band,
      |                      r_regionkey * 100.0 AS lo,
      |                      (r_regionkey + 1) * 100.0 AS hi FROM region)
      |SELECT band, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
      |FROM events JOIN bands ON value >= lo AND value < hi
      |GROUP BY band ORDER BY band""".stripMargin

  /** Skew-safe two-phase aggregation: salt the hot key-space, partial-agg,
    * then merge — result provably identical to the plain aggregation (the
    * oracle checks exactly that). Decimal partials re-aggregate losslessly.
    */
  def saltedRevenueByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("o_orderpriority"), col("salt"))
      .agg(sum(revenue).as("partial_rev"), count(lit(1)).as("partial_n"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("partial_rev")).cast("double").as("revenue"),
        sum(col("partial_n")).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val saltedRevenueSql: String =
    """SELECT o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Distinct aggregation (absent in reference): exact distinct customers
    * and orders per priority.
    */
  def distinctCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val distinctCustomersSql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** approx_count_distinct (HLL++) — approximate by design, so the sketch
    * value itself can't be oracle-hashed. Instead the gate output carries
    * the quantitative evidence: `err_bound_ok` is computed by comparing the
    * HLL estimate against the exact distinct count inside Spark (3σ of the
    * default 5% rsd → 15% bound), and the oracle emits a literal TRUE next
    * to its own exact counts — the hash matches IFF the estimate is within
    * bound AND the exact anchors agree. This upgrades the gate from
    * rows-only to hash-checked without pretending the sketch is exact.
    */
  def approxDistinctParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts").cast("double") * lit(0.15)).as("err_bound_ok"))
      .orderBy(col("l_returnflag"))

  val approxDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(*) AS n, TRUE AS err_bound_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mergeable approximate quantiles — the 100 TB scale path the EXACT
    * rank-arithmetic gate ([[langLengthQuantiles]]) cannot take: exact
    * per-group quantiles need a per-group total order (a distributed sort
    * of the whole group), while `percentile_approx`'s Greenwald–Khanna
    * sketch is a bounded-size partial aggregate — each partition folds its
    * rows into a sketch, sketches merge associatively on the exchange, and
    * the rank-error guarantee `|rank(est) − p·n| ≤ n/accuracy` holds after
    * any merge order. Like the HLL gate, estimates are engine-specific, so
    * the gate verifies the GUARANTEE in-engine: a second pass counts each
    * estimate's true rank and emits the bound check the oracle pins to
    * literal TRUE — a FALSE anywhere hash-fails the gate.
    */
  def approxQuantilesPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val acc = 10000 // rank error ≤ n/acc per GK guarantee
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val sk = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.9)), lit(acc))
        .as("aq"), count(lit(1)).as("n"))
    li.join(broadcast(sk), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        sum(when(col("v") <= col("aq")(0), lit(1L)).otherwise(lit(0L)))
          .as("r50"),
        sum(when(col("v") <= col("aq")(1), lit(1L)).otherwise(lit(0L)))
          .as("r90"))
      .select(col("l_returnflag"), col("n"),
        (abs(col("r50") - col("n") * lit(0.5)) <=
          col("n").cast("double") / lit(acc.toDouble) + lit(1.0))
          .as("median_bound_ok"),
        (abs(col("r90") - col("n") * lit(0.9)) <=
          col("n").cast("double") / lit(acc.toDouble) + lit(1.0))
          .as("p90_bound_ok"))
      .orderBy(col("l_returnflag"))
  }

  val approxQuantilesSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  TRUE AS median_bound_ok, TRUE AS p90_bound_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Semi/anti joins (EXISTS / NOT EXISTS — absent in the reference):
    * customers with an urgent order, and customers with no orders at all.
    */
  def semiAntiCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val hasUrgent = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
      .withColumn("tag", lit("has_urgent"))
    val noOrders = cust.join(ord.select("o_custkey"),
      cust("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("tag", lit("no_orders"))
    hasUrgent.unionByName(noOrders).orderBy(col("tag"), col("c_custkey"))
  }

  val semiAntiSql: String =
    """SELECT c_custkey, 'has_urgent' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT c_custkey, 'no_orders' FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY tag, c_custkey""".stripMargin

  /** TPC-H Q17 analog (correlated scalar subquery): revenue lost to
    * small-quantity orders — lineitems under half their part's mean
    * quantity. The correlated subquery decorrelates into an aggregate +
    * join on `l_partkey` (what Catalyst does to real correlated subqueries).
    * The avg is built from decimal-exact sum / count so the threshold is
    * the identical double on both engines.
    */
  def q17SmallQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(((sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
        count(lit(1))) * lit(0.5)).as("half_avg_qty"))
    li.join(perPart, li("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN (
      |  SELECT l_partkey AS pk,
      |    (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*)) * 0.5 AS half_avg_qty
      |  FROM lineitem GROUP BY l_partkey) p ON l_partkey = pk
      |WHERE l_quantity < half_avg_qty""".stripMargin

  /** lag/lead analytic window: days between a customer's consecutive orders. */
  def orderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("gap_days"))
      .orderBy(col("o_orderkey"))
  }

  val orderGapsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(date_diff('day',
      |    LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS BIGINT) AS gap_days
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** CUBE grouping sets over returnflag × linestatus. */
  def cubeSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val cubeSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** PIVOT: the year × order-priority revenue matrix. The pivot value list
    * is EXPLICIT, which matters at scale — without it Spark runs a distinct
    * pre-pass over the pivot column (an extra full-scan job) and the output
    * schema depends on the data; with it the plan is a single groupBy whose
    * map-side partial aggregation absorbs the fan-out, exactly a manual
    * CASE-WHEN matrix (which is what the oracle spells out).
    */
  val PivotPriorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def pivotPriorityRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .pivot("o_orderpriority", PivotPriorities)
      .agg(dsum(col("o_totalprice")))
      .orderBy("o_year")

  val pivotSql: String = {
    val cells = PivotPriorities.map { p =>
      s"""CAST(CAST(SUM(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS "$p""""
    }.mkString(", ")
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $cells
       |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin
  }

  /** GROUPING SETS with grouping() provenance flags — the general form
    * rollup/cube specialize. One pass: Spark expands the sets map-side and
    * partial-aggregates before the exchange, same as rollup/cube.
    */
  def groupingSetsSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** EXACT distributed quantiles by rank arithmetic — median and p90 of
    * document length per language. No sketch, no interpolation ambiguity:
    * a per-group row_number over a total order picks the exact rank
    * element(s); the median averages the two middle ranks (odd groups match
    * one row, even groups two — the sum/count form covers both branches
    * with no conditional). One shuffle on the group key; the window and the
    * aggregation share it. This is the scale form of `quantile_cont`-style
    * exact quantiles: rank selection over a distributed sort, never a
    * driver-side collect of group values.
    */
  def langLengthQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val mid = col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2")
    val p90 = col("rn") === greatest(lit(1L), ceil(col("n") * 0.9))
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_docs"),
        (sum(when(mid, col("n_chars"))) / sum(when(mid, lit(1L)))).as("median"),
        max(when(p90, col("n_chars"))).as("p90"))
      .orderBy(col("lang"))
  }

  val quantilesSql: String =
    """WITH r AS (SELECT lang, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      |  FROM documents)
      |SELECT lang, MAX(n) AS n_docs,
      |  CAST(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN n_chars END) AS BIGINT)
      |    / CAST(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN 1 END) AS BIGINT) AS median,
      |  MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(n * 0.9) AS BIGINT)) THEN n_chars END) AS p90
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_semi_anti_customers" -> (semiAntiCustomers _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q_pivot_priority_year" -> (pivotPriorityRevenue _),
    "q_grouping_sets" -> (groupingSetsSummary _),
    "q_quantiles_lang" -> (langLengthQuantiles _),
    "q_order_gaps" -> (orderGaps _),
    "q_cube_summary" -> (cubeSummary _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_late_orders" -> (q4LateOrders _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q_top_parts_per_brand" -> (topPartsPerBrand _),
    "q_topk_operator" -> (topPartsPerBrandOperator _),
    "q_setops_customers" -> (setOpsCustomers _),
    "q_rollup_summary" -> (rollupSummary _),
    "q_asof_purchase_click" -> (asofPurchaseClick _),
    "q_range_join_bands" -> (rangeJoinValueBands _),
    "q_salted_revenue" -> (saltedRevenueByPriority _),
    "q_distinct_customers" -> (distinctCustomers _),
    "q_approx_distinct_parts" -> (approxDistinctParts _),
    "q_approx_quantiles_price" -> (approxQuantilesPrice _),
    "q18_large_volume" -> (q18LargeVolume _),
    "q_above_brand_avg" -> (aboveBrandAverageParts _),
  )

  /** TPC-H Q18 analog: customers with large-volume orders. Aggregate-then-
    * semi-join shape — the quantity sum is computed BEFORE touching orders/
    * customer, so the join legs carry only qualifying orderkeys (at sf100
    * that is thousands of rows against two fact scans, not a fact×fact
    * pre-join). Decimal-cast sum keeps the HAVING boundary exact.
    */
  def q18LargeVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq"))
      .filter(col("sq") >= 200)
      .select(col("l_orderkey"), col("sq").cast("double").as("sum_qty"))
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) >= 200
      |ORDER BY o_orderkey""".stripMargin

  /** Correlated-subquery shape (`price > (SELECT AVG(price) ... WHERE same
    * brand)`), decorrelated into a brand window — and made EXACT by
    * comparing `price·n > Σprice` in decimal arithmetic instead of a
    * rounding double average (oracle-parity playbook: boundary rows can
    * flip under different average orders).
    */
  def aboveBrandAverageParts(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
    Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_retailprice")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("p_retailprice").cast("decimal(18,4)")).over(w))
      .filter(col("p_retailprice").cast("decimal(18,4)") * col("n") > col("s"))
      .select("p_partkey", "p_brand", "p_retailprice")
      .orderBy("p_partkey")
  }

  val aboveBrandAvgSql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |JOIN (SELECT p_brand, COUNT(*) AS n,
      |             SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS s
      |      FROM part GROUP BY p_brand) b USING (p_brand)
      |WHERE CAST(p_retailprice AS DECIMAL(18,4)) * n > s
      |ORDER BY p_partkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_semi_anti_customers" -> semiAntiSql,
    "q17_small_quantity" -> q17Sql,
    "q_pivot_priority_year" -> pivotSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_quantiles_lang" -> quantilesSql,
    "q_order_gaps" -> orderGapsSql,
    "q_cube_summary" -> cubeSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_late_orders" -> q4Sql,
    "q5_local_supplier" -> q5Sql,
    "q7_volume_shipping" -> q7Sql,
    "q10_returned_items" -> q10Sql,
    "q_top_parts_per_brand" -> topPartsSql,
    // result-identical to the window form by construction
    "q_topk_operator" -> topPartsSql,
    "q_setops_customers" -> setOpsSql,
    "q_rollup_summary" -> rollupSql,
    "q_asof_purchase_click" -> asofSql,
    "q_range_join_bands" -> rangeJoinSql,
    "q_salted_revenue" -> saltedRevenueSql,
    "q_distinct_customers" -> distinctCustomersSql,
    // hash-checked error-bound form: oracle TRUE matches iff the HLL
    // estimate is within 3σ of exact (see approxDistinctParts)
    "q_approx_distinct_parts" -> approxDistinctSql,
    "q_approx_quantiles_price" -> approxQuantilesSql,
    "q18_large_volume" -> q18Sql,
    "q_above_brand_avg" -> aboveBrandAvgSql,
  )
}
