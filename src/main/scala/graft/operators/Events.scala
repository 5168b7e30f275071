package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.functions.Num._
import graft.Op.SUM_D

/** Event-stream analytics in batch shape (SURVEY §2 rows 27–32).
  *
  * q31/q32 are the batch-equivalent plans of the Structured Streaming
  * pipelines in [[graft.streaming.StreamOps]]; the streaming variants are
  * asserted equal to these in `StreamingSpec` via MemoryStream. On a real
  * cluster the streaming form runs incrementally with watermark-bounded
  * state — same results on complete input, which is what the oracle checks.
  *
  * DuckDB sees the raw ns timestamps; Spark µs. All time arithmetic is
  * done at µs precision on both sides (oracle casts ts to TIMESTAMP).
  */
object Events {

  // --- 27. tumbling time-window aggregation ----------------------------
  def q27(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val q27Sql: String =
    s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
       |  event_type, COUNT(*) AS n_events, ${SUM_D("value")} AS total_value
       |FROM events
       |GROUP BY hour, event_type
       |ORDER BY hour, event_type""".stripMargin

  // --- 28. gap-based sessionization ------------------------------------
  /** Sessions = runs of per-user events with < 30 min between
    * consecutive events. Pure window functions — one shuffle on user_id,
    * no driver-side state, scales with the number of users.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q28Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
       |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
       |      OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
       |       - CAST(floor(epoch(LAG(CAST(ts AS TIMESTAMP)) OVER w)) AS BIGINT) > 1800
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
       |sessions AS (
       |  SELECT user_id, event_id, value, ts,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  ${SUM_D("value")} AS session_value
       |FROM sessions
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // --- 29. JSON field extraction ---------------------------------------
  def q29(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("k_sum"))
      .orderBy(col("k_bucket"))

  val q29Sql: String =
    """SELECT CAST(props::JSON->>'k' AS INT) % 10 AS k_bucket,
      |  COUNT(*) AS n, CAST(SUM(CAST(props::JSON->>'k' AS INT)) AS BIGINT) AS k_sum
      |FROM events
      |GROUP BY k_bucket
      |ORDER BY k_bucket""".stripMargin

  // --- 30. ordered funnel (signup → purchase) --------------------------
  def q30(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firstSignup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("su_user"))
      .agg(min(col("ts")).as("first_signup_ts"))
    ev.filter(col("event_type") === "purchase")
      .join(broadcast(firstSignup), col("user_id") === col("su_user"))
      .filter(col("ts") > col("first_signup_ts"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases_after"),
        date_format(min(col("first_signup_ts")), "yyyy-MM-dd HH:mm:ss").as("first_signup"),
        dsum(col("value")).as("purchase_value"))
      .orderBy(col("user_id"))
  }

  val q30Sql: String =
    s"""WITH su AS (
       |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_signup_ts
       |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
       |SELECT e.user_id, COUNT(*) AS n_purchases_after,
       |  strftime(MIN(su.first_signup_ts), '%Y-%m-%d %H:%M:%S') AS first_signup,
       |  ${SUM_D("e.value")} AS purchase_value
       |FROM events e JOIN su ON e.user_id = su.user_id
       |WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > su.first_signup_ts
       |GROUP BY e.user_id
       |ORDER BY e.user_id""".stripMargin

  // --- 31. windowed distinct users (batch shape of streaming window) ---
  def q31(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(window(col("ts"), "6 hours").getField("start"),
        "yyyy-MM-dd HH:mm:ss").as("win_start"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("win_start"))

  val q31Sql: String =
    """SELECT strftime(make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT) * 21600 * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events
      |GROUP BY win_start
      |ORDER BY win_start""".stripMargin

  // --- 32. dedup-keep-first (batch shape of streaming dropDuplicates) --
  def q32(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q32Sql: String =
    """SELECT user_id, event_type, event_id,
      |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS first_ts
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // --- 64. as-of join ----------------------------------------------------
  /** For each purchase, the most recent prior click by the same user —
    * the classic as-of join, which Spark has no native operator for.
    * Composed per the preference order (compose > custom plan): union the
    * two sides and take a running `max(click ts)` over preceding rows —
    * one shuffle on user_id, no range-join explosion, state bounded by
    * the window frame. */
  def q64(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_ts"),
        (col("ts").cast("long") - col("last_click_ts").cast("long")).as("gap_sec"))
      .orderBy(col("p_id"))
  }

  val q64Sql: String =
    """SELECT event_id AS p_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
      |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(last_click_ts)) AS BIGINT) AS gap_sec
      |FROM (
      |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    MAX(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
      |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase')) t
      |WHERE event_type = 'purchase'
      |ORDER BY p_id""".stripMargin

  // --- 69. sliding time windows ------------------------------------------
  /** 6 h windows sliding every 3 h — each event lands in 2 windows
    * (Spark's `window(ts, dur, slide)` generator). The oracle replays the
    * slide-aligned grid: starts at floor(t/slide)·slide and one slide
    * earlier. */
  def q69(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(window(col("ts"), "6 hours", "3 hours").as("win"), col("value"))
      .groupBy(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("win_start"))

  val q69Sql: String =
    s"""WITH g AS (
       |  SELECT value, make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 10800) AS BIGINT) * 10800 * 1000000) AS w0
       |  FROM events),
       |expanded AS (
       |  SELECT value, w0 AS w FROM g
       |  UNION ALL
       |  SELECT value, w0 - INTERVAL 3 HOUR AS w FROM g)
       |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS win_start,
       |  COUNT(*) AS n_events, ${SUM_D("value")} AS total_value
       |FROM expanded
       |GROUP BY win_start
       |ORDER BY win_start""".stripMargin

  // --- 194. cohort retention (r13) ------------------------------------------
  /** The classic event-analytics readout the family was missing: bucket
    * users into COHORTS by their first-activity week and report, per
    * (cohort, week offset), how many came back — the retention matrix
    * every product/engagement dashboard draws. Weeks are exact integer
    * day arithmetic against a fixed epoch anchor with FLOOR division
    * (a plain `div`/`//` truncates toward zero, which would collapse
    * days −6..+6 around the anchor into one double-width bucket for a
    * corpus with pre-anchor timestamps — r13 review), so the anchor
    * genuinely only phases the buckets; no calendar/locale semantics
    * to disagree cross-engine.
    *
    * Scale shape: one map-side-combined min per user (the cohort
    * assignment), one distinct over (user, week) — the only
    * user-keyed shuffles, both ∝ active (user, week) pairs, never raw
    * events (the distinct pre-aggregates map-side) — then a
    * cohort-keyed aggregate and a ≤\|cohorts\| broadcast join for the
    * denominators. FULL oracle (same integer week rule). */
  private val CohortEpoch = "2024-01-01"

  def q194(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Num
    val ev = Tables.events(s, dir).select(col("user_id"),
      // exact integer FLOOR division: d - pmod(d, 7) is divisible by 7
      expr("CAST(datediff(to_date(ts), " +
        s"DATE'$CohortEpoch') AS BIGINT)").as("d"))
      .select(col("user_id"),
        expr("(d - ((d % 7) + 7) % 7) div 7L").as("wk"))
    val firstWk = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    val activeWk = ev.distinct().join(firstWk, "user_id")
    val cohorts = firstWk.groupBy(col("cwk"))
      .agg(count(lit(1)).as("cohort_size"))
    activeWk
      .groupBy(col("cwk").as("cohort_week"),
        (col("wk") - col("cwk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohorts.withColumnRenamed("cwk", "cohort_week")),
        "cohort_week")
      .withColumn("retention",
        Num.ratio6(col("n_active"), col("cohort_size")))
      .select(col("cohort_week").cast("long"),
        col("week_offset").cast("long"), col("n_active"),
        col("cohort_size"), col("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q194Sql: String =
    s"""WITH evd AS (
       |  SELECT user_id,
       |    CAST((CAST(ts AS DATE) - DATE '$CohortEpoch') AS BIGINT) AS d
       |  FROM events),
       |ev AS (
       |  SELECT user_id, (d - ((d % 7) + 7) % 7) // 7 AS wk FROM evd),
       |fw AS (SELECT user_id, MIN(wk) AS cwk FROM ev GROUP BY user_id),
       |aw AS (SELECT DISTINCT e.user_id, f.cwk, e.wk
       |  FROM ev e JOIN fw f USING (user_id)),
       |cs AS (SELECT cwk, COUNT(*) AS cohort_size FROM fw GROUP BY cwk)
       |SELECT CAST(a.cwk AS BIGINT) AS cohort_week,
       |  CAST(a.wk - a.cwk AS BIGINT) AS week_offset,
       |  COUNT(*) AS n_active, ANY_VALUE(c.cohort_size) AS cohort_size,
       |  ${graft.functions.Num.ratio6Sql(
            "COUNT(*)", "ANY_VALUE(c.cohort_size)")} AS retention
       |FROM aw a JOIN cs c USING (cwk)
       |GROUP BY a.cwk, a.wk - a.cwk
       |ORDER BY cohort_week, week_offset""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q27_tumbling_window", q27, Some(q27Sql)),
    Op("q194_cohort_retention", q194, Some(q194Sql)),
    Op("q28_sessionize", q28, Some(q28Sql)),
    Op("q29_json_extract", q29, Some(q29Sql)),
    Op("q30_event_funnel", q30, Some(q30Sql)),
    Op("q31_stream_window", q31, Some(q31Sql)),
    Op("q32_stream_dedup", q32, Some(q32Sql)),
    Op("q64_asof_join", q64, Some(q64Sql)),
    Op("q69_sliding_window", q69, Some(q69Sql)),
  )
}
