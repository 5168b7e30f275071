package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.Op.SUM_D
import graft.functions.Num.dsum

/** Relational surface, continued (SURVEY §2 rows 57–60): outer joins,
  * statistical aggregates, ordered collect, time-range join. */
object Relational2 {

  // --- 57. FULL OUTER join of two aggregates ----------------------------
  def q57(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val supp = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    cust.join(supp, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0)).as("n_cust"),
        coalesce(col("n_supp"), lit(0)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q57Sql: String =
    """SELECT COALESCE(ck, sk) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      |  ON ck = sk
      |ORDER BY nationkey""".stripMargin

  // --- 58. statistical aggregate pack -----------------------------------
  /** stddev/variance/corr — scale-free or scale-bounded statistics whose
    * parallel-merge noise sits ~1e-12 relative, rounded well inside it. */
  def q58(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q58Sql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  round(var_samp(l_quantity), 6) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- 59. ordered collect (listagg) ------------------------------------
  /** collect_list is unordered by contract; array_sort canonicalizes —
    * the only way a distributed collect is reproducible. */
  def q59(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(array_join(array_sort(collect_list(col("o_orderstatus"))), ",")
        .as("statuses"))
      .orderBy(col("o_custkey"))

  val q59Sql: String =
    """SELECT o_custkey,
      |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // --- 60. time-range join ----------------------------------------------
  /** Clicks within 10 min before each purchase, per user. The equi-key
    * (user_id) carries the shuffle; the range predicate filters inside
    * the join — at scale this is the bucketable form of an interval
    * join. */
  def q60(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("p_ts"), "left")
      .groupBy(col("p_id"))
      .agg(sum(when(col("c_user").isNotNull, 1).otherwise(0)).as("n_clicks_before"))
      .orderBy(col("p_id"))
  }

  val q60Sql: String =
    """SELECT p.event_id AS p_id,
      |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks_before
      |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |      WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |      WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      |GROUP BY p_id
      |ORDER BY p_id""".stripMargin

  // --- 65. ntile bucketing -----------------------------------------------
  /** NTILE(4) without the global sort: `ntile().over(Window.orderBy(…))`
    * ranks the whole table in ONE task. Instead, the three quartile
    * boundary ranks (NTILE fills the first n mod k buckets one heavier:
    * c_i = i·⌊n/4⌋ + min(i, n mod 4)) are resolved to exact boundary KEYS
    * by [[graft.functions.OrderStats.keysAtRanks]], and each row's bucket
    * is a codegen'd struct-comparison CASE against the three broadcast
    * keys — identical tie handling (o_orderkey is the unique tiebreak),
    * zero corpus sorts. */
  def q65(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
    // rank DECIMAL prices on the exact unscaled integer, not a double
    // cast: distinct decimals beyond ~15.95 significant digits collapse
    // under double, which would silently diverge from NTILE's exact
    // decimal order near a boundary (ADVICE r2). The unscaled value of a
    // precision ≤ 15 decimal is < 2^53, so its double image is exact AND
    // order-faithful; wider decimals fail fast. Non-decimal price columns
    // (this testdata stores doubles) are already their own exact key.
    val unscaled = o.schema("o_totalprice").dataType match {
      case dt: org.apache.spark.sql.types.DecimalType =>
        require(dt.precision <= 15,
          s"q65 ranks decimals exactly only up to precision 15, got $dt")
        (col("o_totalprice") * lit(java.math.BigDecimal.TEN.pow(dt.scale)))
          .cast("long").cast("double")
      case _ => col("o_totalprice").cast("double")
    }
    val ranked = o.select(unscaled.as("v"), col("o_orderkey").as("id"))
    // one fused pass: the NTILE boundary ranks need n, the rank search
    // needs (count, min/max v, min/max id) — same aggregate (r7)
    val g = ranked.agg(count(lit(1)), min(col("v")), max(col("v")),
      min(col("id")), max(col("id"))).head()
    val n = g.getLong(0)
    import s.implicits._
    val targets = (1 to 3).map(i => (i, i * (n / 4) + math.min(i, n % 4)))
      .toDF("idx", "t")
    val preGlob = if (n == 0) None
      else Some((n, g.getDouble(1), g.getDouble(2), g.getLong(3), g.getLong(4)))
    val bCols = (1 to 3).map(i =>
      min(when(col("idx") === i, struct(col("v"), col("id")))).as(s"b$i"))
    val brow = graft.functions.OrderStats.keysAtRanks(ranked, targets,
        preGlob = preGlob)
      .agg(bCols.head, bCols.tail: _*)
    o.crossJoin(broadcast(brow))
      .withColumn("key",
        struct(unscaled.as("v"), col("o_orderkey").as("id")))
      .withColumn("quartile", (lit(1) +
        when(col("key") > col("b1"), 1).otherwise(0) +
        when(col("key") > col("b2"), 1).otherwise(0) +
        when(col("key") > col("b3"), 1).otherwise(0)).cast("long"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("quartile"))
  }

  val q65Sql: String =
    s"""SELECT quartile, COUNT(*) AS n, ${SUM_D("o_totalprice")} AS total
       |FROM (SELECT o_totalprice,
       |  NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
       |  FROM orders) t
       |GROUP BY quartile
       |ORDER BY quartile""".stripMargin

  // --- 66. percent_rank / cume_dist --------------------------------------
  /** Ratio-valued windows: both are exact int-ratio doubles ((r−1)/(n−1),
    * k/n) — identical in any engine, no rounding needed. */
  def q66(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("pr") >= 0.95)
      .select(col("c_mktsegment"), col("c_custkey"), col("pr"), col("cd"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  val q66Sql: String =
    """SELECT c_mktsegment, c_custkey, pr, cd FROM (
      |  SELECT c_mktsegment, c_custkey,
      |    percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)) t
      |WHERE pr >= 0.95
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // --- 67. fixed-width histogram ------------------------------------------
  def q67(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      .orderBy(col("bucket"))

  val q67Sql: String =
    s"""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
       |  COUNT(*) AS n, ${SUM_D("l_extendedprice")} AS total
       |FROM lineitem
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  // --- 68. INTERSECT / EXCEPT set operators -------------------------------
  /** Customers that bought in 1996 but not 1997 (EXCEPT) and in both
    * (INTERSECT) — Spark's intersect/except distinct set semantics. */
  def q68(s: SparkSession, dir: String): DataFrame = {
    def buyers(year: Int) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("date") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("date"))
      .select(col("o_custkey"))
    val both = buyers(1996).intersect(buyers(1997))
      .select(lit("both_years").as("cohort"), col("o_custkey"))
    val churned = buyers(1996).except(buyers(1997))
      .select(lit("churned").as("cohort"), col("o_custkey"))
    both.unionAll(churned)
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("cohort"))
  }

  val q68Sql: String =
    """WITH b96 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'),
      |b97 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01')
      |SELECT cohort, COUNT(*) AS n_customers FROM (
      |  SELECT 'both_years' AS cohort, o_custkey FROM (SELECT o_custkey FROM b96 INTERSECT SELECT o_custkey FROM b97) x
      |  UNION ALL
      |  SELECT 'churned' AS cohort, o_custkey FROM (SELECT o_custkey FROM b96 EXCEPT SELECT o_custkey FROM b97) y) z
      |GROUP BY cohort
      |ORDER BY cohort""".stripMargin

  // --- 89. exact GLOBAL quantiles without a global sort (r4) --------------
  /** The high-cardinality complement of q24: q24 interpolates exact
    * per-group percentiles after collapsing a LOW-cardinality measure to
    * (group, value, cnt); for a measure that is distinct-per-row (here
    * `events.value`, ~95 % distinct) that collapse saves nothing, and
    * the naive plans — `percentile()` (buffers every value in one
    * aggregate buffer) or an unpartitioned `ORDER BY` rank (sorts the
    * corpus in ONE task) — are the two canonical 100×-breakers.
    *
    * Instead the two bracketing ranks of each requested quantile
    * (percentile_cont positions: pos = (n−1)·p + 1) resolve to exact
    * boundary keys via [[graft.functions.OrderStats.keysAtRanks]] —
    * aggregate-shaped passes only — and the interpolation is a 5-row
    * post-join. Total: two corpus aggregate passes (count + histogram)
    * plus the narrow leaf pass, independent of n. The driver-computed
    * rank positions replay exactly in the oracle because (n−1)·p + 1 is
    * the same IEEE product in both engines. */
  def q89(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("value").cast("double").as("v"), col("event_id").cast("long").as("id"))
    // one fused pass: n for the rank positions + the rank search's
    // global stats (r7)
    val g = ev.agg(count(lit(1)), min(col("v")), max(col("v")),
      min(col("id")), max(col("id"))).head()
    val n = g.getLong(0)
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val metaRows = ps.zipWithIndex.map { case (p, i) =>
      val pos = (n - 1) * p + 1.0
      (i.toLong, p, pos - math.floor(pos),
        math.floor(pos).toLong, math.ceil(pos).toLong)
    }
    import s.implicits._
    // lo == hi when pos is integral — Set dedups so OrderStats sees each
    // (idx, rank) once; min/max over (t, v) rebuilds the bracket below
    val targets = metaRows
      .flatMap { case (i, _, _, lo, hi) => Set(lo, hi).map(t => (i, t)) }
      .toDF("idx", "t")
    val meta = metaRows.map { case (i, p, frac, _, _) => (i, p, frac) }
      .toDF("idx", "p", "frac")
    val keys = graft.functions.OrderStats.keysAtRanks(ev, targets,
        preGlob = if (n == 0) None
          else Some((n, g.getDouble(1), g.getDouble(2), g.getLong(3), g.getLong(4))))
      .groupBy(col("idx"))
      .agg(min(struct(col("t"), col("v"))).getField("v").as("vlo"),
        max(struct(col("t"), col("v"))).getField("v").as("vhi"))
    keys.join(broadcast(meta), "idx")
      .select(col("p"),
        round(col("vlo") + col("frac") * (col("vhi") - col("vlo")), 6).as("q"))
      .orderBy(col("p"))
  }

  val q89Sql: String =
    """WITH v AS (SELECT CAST(value AS DOUBLE) AS v, event_id AS id
      |  FROM events WHERE value IS NOT NULL),
      |ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, id) AS rn FROM v),
      |n AS (SELECT COUNT(*) AS c FROM v),
      |ps(p) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
      |  (CAST(0.75 AS DOUBLE)), (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))),
      |k AS (SELECT p, (c - 1) * p + 1 AS ppos FROM ps CROSS JOIN n)
      |SELECT k.p, round(lo.v + (k.ppos - floor(k.ppos)) * (hi.v - lo.v), 6) AS q
      |FROM k
      |JOIN ranked lo ON lo.rn = CAST(floor(k.ppos) AS BIGINT)
      |JOIN ranked hi ON hi.rn = CAST(ceil(k.ppos) AS BIGINT)
      |ORDER BY p""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q57_full_outer", q57, Some(q57Sql)),
    Op("q58_stats_pack", q58, Some(q58Sql)),
    Op("q59_collect_sorted", q59, Some(q59Sql)),
    Op("q60_range_join", q60, Some(q60Sql)),
    Op("q65_ntile", q65, Some(q65Sql)),
    Op("q66_percent_rank", q66, Some(q66Sql)),
    Op("q67_histogram", q67, Some(q67Sql)),
    Op("q68_set_ops", q68, Some(q68Sql)),
    Op("q89_global_quantiles", q89, Some(q89Sql)),
  )
}
