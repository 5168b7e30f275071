package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.Num._
import graft.Op.{AVG_D, SUM_D}

/** Relational analytics operators (SURVEY §2 rows 1–26).
  *
  * Everything is a declarative DataFrame plan: Catalyst does predicate
  * pushdown, column pruning, and join-strategy selection; dimension sides
  * are `broadcast()` hinted where the TPC-H size ratios make that right at
  * any scale factor. Monetary aggregates use decimal-exact arithmetic
  * ([[graft.functions.Num]]) so results are deterministic under any
  * partitioning — a correctness property, not just an oracle convenience.
  */
object Relational {

  // --- 1. scan → filter → groupBy agg (TPC-H Q1 shape) -----------------
  def q1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${SUM_D("l_quantity")} AS sum_qty,
       |  ${SUM_D("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       |  ${AVG_D("l_quantity")} AS avg_qty,
       |  ${AVG_D("l_extendedprice")} AS avg_price,
       |  ${AVG_D("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '2000-12-31'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- 2. predicate + projection pushed into the parquet scan ----------
  def q2(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") <= 3 &&
        col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity <= 3 AND l_shipdate >= DATE '1996-01-01'
      |  AND l_shipdate < DATE '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --- 3. 3-way join + agg + top-k (TPC-H Q3 shape) --------------------
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("date"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1996-01-01").cast("date"))
    // group on the RAW date and format after the aggregation: the
    // shuffle key stays (long, date-int) instead of (long, string) and
    // date_format runs once per GROUP, not per joined row (r8; output
    // bit-identical — the date↔string map is injective)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-01-01'
      |  AND l_shipdate  > DATE '1996-01-01'
      |GROUP BY l_orderkey, order_date
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 20""".stripMargin

  // --- 4. dimension broadcast join -------------------------------------
  def q4(s: SparkSession, dir: String): DataFrame = {
    val geo = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
    Tables.customer(s, dir)
      .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("num_customers"), davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q4Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS num_customers,
       |  ${AVG_D("c_acctbal")} AS avg_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // --- 5. snowflake multi-join + agg (TPC-H Q5 shape) ------------------
  def q5(s: SparkSession, dir: String): DataFrame = {
    val geo = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --- 6. selective filter + global agg (TPC-H Q6 shape) ---------------
  def q6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1997-01-01").cast("date") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin

  // --- 7. groupBy + HAVING ---------------------------------------------
  def q7(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("num_orders"), dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("num_orders") > 3)
      .orderBy(col("o_custkey"))

  val q7Sql: String =
    s"""SELECT o_custkey, COUNT(*) AS num_orders,
       |  ${SUM_D("o_totalprice")} AS total_spent
       |FROM orders
       |GROUP BY o_custkey
       |HAVING COUNT(*) > 3
       |ORDER BY o_custkey""".stripMargin

  // --- 8. multi-column DISTINCT ----------------------------------------
  def q8(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q8Sql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // --- 9. top-k (TakeOrderedAndProject, no global sort at scale) -------
  def q9(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  val q9Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  // --- 10. window rank-per-group ---------------------------------------
  def q10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q10Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  // --- 11. running-sum window frame ------------------------------------
  def q11(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_total", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // --- 12. lag/lead offset windows -------------------------------------
  def q12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")))
      .filter(col("prev_date").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"), col("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey, days_since_prev FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day',
      |      CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
      |  FROM orders) t
      |WHERE days_since_prev IS NOT NULL
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- 13. left-semi join (EXISTS) -------------------------------------
  def q13(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q13Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // --- 14. left-anti join (NOT EXISTS) ---------------------------------
  def q14(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
    Tables.customer(s, dir)
      .join(hi, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q14Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // --- 15. UNION ALL of heterogeneous selects --------------------------
  def q15(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      .select(lit("high_value").as("bucket"), col("o_orderkey").as("key"))
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("bucket"), col("o_orderkey").as("key"))
    hi.unionAll(urgent)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("key")).as("n_distinct"))
      .orderBy(col("bucket"))
  }

  val q15Sql: String =
    """SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT key) AS n_distinct FROM (
      |  SELECT 'high_value' AS bucket, o_orderkey AS key FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT 'urgent' AS bucket, o_orderkey AS key FROM orders WHERE o_orderpriority = '1-URGENT') t
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // --- 16. ROLLUP -------------------------------------------------------
  def q16(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
      .orderBy(col("status"), col("priority"))

  val q16Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n_orders, ${SUM_D("o_totalprice")} AS total
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // --- 17. CUBE ----------------------------------------------------------
  def q17(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q17Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  COUNT(*) AS n, ${SUM_D("l_quantity")} AS qty
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // --- 18. conditional aggregation (pivot via CASE) --------------------
  def q18(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  val q18Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- 19. scalar-subquery threshold (TPC-H Q17 shape, decorrelated) ---
  def q19(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // Correlated `l_quantity < 0.5 * avg(l_quantity per part)` decorrelated
    // into an aggregate + broadcast-join — the plan Catalyst itself would
    // produce for the subquery form, made explicit.
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * 0.5).as("half_avg_qty"))
    li.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n"))
  }

  val q19Sql: String =
    s"""SELECT ${SUM_D("l_extendedprice")} AS total_price, COUNT(*) AS n
       |FROM lineitem l
       |WHERE l_quantity < (
       |  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
       |  WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  // --- 20. correlated EXISTS (TPC-H Q4 shape) --------------------------
  def q20(s: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("2000-01-01").cast("date"))
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q20Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > DATE '2000-01-01')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- 21. string expression pack --------------------------------------
  def q21(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_type").like("%PROMO%"), 1).otherwise(0).as("is_promo"),
        regexp_replace(col("p_name"), "[0-9]+", "#").as("name_masked"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy(col("p_partkey"))

  val q21Sql: String =
    """SELECT p_partkey,
      |  UPPER(SUBSTR(p_name, 1, 8)) AS name_prefix,
      |  p_brand || '/' || p_type AS brand_type,
      |  CASE WHEN p_type LIKE '%PROMO%' THEN 1 ELSE 0 END AS is_promo,
      |  regexp_replace(p_name, '[0-9]+', '#', 'g') AS name_masked,
      |  LENGTH(p_name) AS name_len
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // --- 22. date bucketing ------------------------------------------------
  def q22(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_year"), col("o_month"))

  val q22Sql: String =
    s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
       |  COUNT(*) AS n_orders, ${SUM_D("o_totalprice")} AS total
       |FROM orders
       |GROUP BY o_year, o_month
       |ORDER BY o_year, o_month""".stripMargin

  // --- 23. exact multi-column COUNT(DISTINCT) --------------------------
  def q23(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))

  val q23Sql: String =
    """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT o_orderpriority) AS n_prio,
      |  COUNT(*) AS n_orders
      |FROM orders""".stripMargin

  // --- 24. exact interpolated percentiles ------------------------------
  /** Exact interpolated percentiles WITHOUT Spark's `percentile`
    * aggregate, whose buffer holds every value of the group in one
    * executor (corpus-sized state at 100 TB — the aggregate-shaped
    * cousin of the global-window sort). l_quantity is low-cardinality,
    * so the group collapses first to (flag, value, cnt) — one
    * map-side-combined pass — and the quantile_cont interpolation
    * (pos = p·(n−1); v_lo + (v_hi − v_lo)·frac, the same formula Spark
    * and DuckDB use) runs over the tiny aggregated relation with
    * broadcast joins locating the bracketing values. High-cardinality
    * measures go to q25's sketches or OrderStats ranks instead. */
  def q24(s: SparkSession, dir: String): DataFrame = {
    val vc = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val cum = vc.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prior", col("cum") - col("cnt"))
    val n = vc.groupBy(col("l_returnflag")).agg(sum(col("cnt")).as("n"))
    val ps = Seq(0.25, 0.5, 0.75)
    val pos = n.select(col("l_returnflag"), explode(array(ps.map(lit): _*)).as("p"),
        (col("n") - 1).cast("double").as("nm1"))
      .select(col("l_returnflag"), col("p"), (col("p") * col("nm1")).as("pos"))
      .withColumn("ilo", floor(col("pos")).cast("long"))
      .withColumn("ihi", ceil(col("pos")).cast("long"))
    // the value at 0-based index i is the row whose [prior, cum) covers i;
    // each bracket side gets its own column names (same-lineage joins are
    // ambiguous otherwise)
    def at(as: String) =
      cum.select(col("l_returnflag").as(s"${as}_f"), col("l_quantity").as(as),
        col("prior").as(s"${as}_prior"), col("cum").as(s"${as}_cum"))
    val lo = at("vlo")
    val hi = at("vhi")
    val interp = pos
      .join(broadcast(lo), col("l_returnflag") === col("vlo_f") &&
        col("ilo") >= col("vlo_prior") && col("ilo") < col("vlo_cum"))
      .join(broadcast(hi), col("l_returnflag") === col("vhi_f") &&
        col("ihi") >= col("vhi_prior") && col("ihi") < col("vhi_cum"))
      .select(col("l_returnflag"), col("p"),
        (col("vlo") + (col("vhi") - col("vlo")) * (col("pos") - col("ilo")))
          .as("v"))
    interp.groupBy(col("l_returnflag"))
      .pivot("p", ps)
      .agg(first(col("v")))
      .select(col("l_returnflag"), col("`0.25`").as("p25"),
        col("`0.5`").as("p50"), col("`0.75`").as("p75"))
      .orderBy(col("l_returnflag"))
  }

  val q24Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5)  AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- 25. approximate sketches (HLL++, GK quantiles) — rows-check -----
  def q25(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median_price"))
      .orderBy(col("l_returnflag"))

  // --- 26. GROUPING SETS -------------------------------------------------
  def q26(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
    joined.createOrReplaceTempView("graft_q26_geo")
    s.sql(
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COUNT(*) AS n_customers
        |FROM graft_q26_geo
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY region, nation""".stripMargin)
  }

  val q26Sql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY region, nation""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q1_pricing_summary", q1, Some(q1Sql)),
    Op("q2_filter_project", q2, Some(q2Sql)),
    Op("q3_join_agg", q3, Some(q3Sql)),
    Op("q4_broadcast_join", q4, Some(q4Sql)),
    Op("q5_multi_join", q5, Some(q5Sql)),
    Op("q6_selective_agg", q6, Some(q6Sql)),
    Op("q7_group_having", q7, Some(q7Sql)),
    Op("q8_distinct", q8, Some(q8Sql)),
    Op("q9_topk", q9, Some(q9Sql)),
    Op("q10_window_rank", q10, Some(q10Sql)),
    Op("q11_window_running", q11, Some(q11Sql)),
    Op("q12_lag_lead", q12, Some(q12Sql)),
    Op("q13_semi_join", q13, Some(q13Sql)),
    Op("q14_anti_join", q14, Some(q14Sql)),
    Op("q15_union_all", q15, Some(q15Sql)),
    Op("q16_rollup", q16, Some(q16Sql)),
    Op("q17_cube", q17, Some(q17Sql)),
    Op("q18_pivot_case", q18, Some(q18Sql)),
    Op("q19_scalar_subquery", q19, Some(q19Sql)),
    Op("q20_correlated_exists", q20, Some(q20Sql)),
    Op("q21_string_funcs", q21, Some(q21Sql)),
    Op("q22_date_funcs", q22, Some(q22Sql)),
    Op("q23_count_distinct", q23, Some(q23Sql)),
    Op("q24_percentile", q24, Some(q24Sql)),
    Op("q25_approx_sketch", q25, None),
    Op("q26_grouping_sets", q26, Some(q26Sql)),
  )
}
