package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Temporal join queries over the events table — the as-of and range join
  * shapes (see [[graft.operators.TemporalJoins]] for the scale design).
  * Both are oracle-checked: DuckDB has a native ASOF JOIN for j15, and
  * j16's interval join is a plain (if quadratic-in-DuckDB) inequality
  * join there.
  */
object TemporalQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J15 — as-of join: every click is attributed to the user's most
    // recent purchase at or before it (classic attribution / last-touch
    // shape). The right side is pre-aggregated to unique (user_id, ts) so
    // the tie-break is explicit rather than engine-defined; clicks with
    // no prior purchase keep nulls (left-outer as-of).
    "j15_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"),
          max_by(col("value"), col("event_id")).as("purchase_value"))
      // no-match rows surface as -1 sentinels (not nulls): a null BIGINT
      // becomes float NaN through the oracle's pandas path and NaN never
      // equals NaN in the exact compare (same convention as x2's -1.0)
      TemporalJoins.asOfJoin(clicks, purchases, "user_id", "ts", "ts",
          Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(col("purchase_value"), lit(-1.0)).as("purchase_value"))
        .orderBy(col("event_id"))
    }),

    // J17 — forward as-of join: every click attributed to the user's
    // NEXT purchase at or after it (conversion-lag shape — the mirror of
    // j15). Right side pre-aggregated to unique (user_id, ts) so the
    // tie-break is explicit; clicks with no later purchase keep the -1
    // sentinels (same convention as j15).
    "j17_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"),
          max_by(col("value"), col("event_id")).as("purchase_value"))
      TemporalJoins.asOfJoinForward(clicks, purchases, "user_id", "ts", "ts",
          Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(col("purchase_value"), lit(-1.0)).as("purchase_value"))
        .orderBy(col("event_id"))
    }),

    // J16 — range join: each signup opens a 6-hour attribution window;
    // count and sum the same user's clicks inside it. Inner semantics —
    // only signups with at least one in-window click appear. The bin
    // width equals the window span, so each interval explodes into at
    // most 2 bins.
    "j16_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 6 HOURS")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      TemporalJoins.rangeJoinBinned(clicks, signups, "user_id",
          "ts", "w_start", "w_end", binWidthSec = 6 * 3600L)
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_clicks"), dsum(col("value")).as("click_value"))
        .orderBy(col("signup_id"))
    }),

    // W4 — rolling window stats: per-user 7-row moving average and
    // running total over the event stream, ordered by (ts, event_id).
    // The sliding frame is 7 rows (constant work per row) and the
    // cumulative sum is a running aggregate; user_id partitions are the
    // parallel unit, so no corpus-wide single-partition window exists
    // anywhere in the plan. Frame sums go through DECIMAL(18,2) — exact
    // and order-independent within the deterministic frame — so the
    // oracle hash-matches.
    "w4_rolling_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val w7 = ord.rowsBetween(-6, Window.currentRow)
      val wc = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val v2 = round(col("value"), 2).cast(DecimalType(18, 2))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          row_number().over(ord).cast("long").as("rn"),
          round(sum(v2).over(w7).cast("double") /
            count(lit(1)).over(w7), 6).as("roll_avg"),
          sum(v2).over(wc).cast("double").as("cum_value"))
        .orderBy(col("event_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "j15_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id,
        |         arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |  COALESCE(p.purchase_id, -1) AS purchase_id,
        |  COALESCE(p.purchase_value, -1.0) AS purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "j17_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id,
        |         arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |  COALESCE(p.purchase_id, -1) AS purchase_id,
        |  COALESCE(p.purchase_value, -1.0) AS purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "j16_range_join" ->
      """WITH s AS (
        |  SELECT event_id AS signup_id, user_id, ts AS w_start,
        |         ts + INTERVAL 6 HOUR AS w_end
        |  FROM events WHERE event_type = 'signup'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT s.signup_id,
        |  COUNT(*) AS n_clicks,
        |  CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM s JOIN c
        |  ON c.user_id = s.user_id AND c.ts >= s.w_start AND c.ts < s.w_end
        |GROUP BY s.signup_id
        |ORDER BY s.signup_id""".stripMargin,

    "w4_rolling_stats" ->
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  round(CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |        / COUNT(*) OVER w7, 6) AS roll_avg,
        |  CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) OVER wc AS DOUBLE) AS cum_value
        |FROM events
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  w7 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        |  wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
