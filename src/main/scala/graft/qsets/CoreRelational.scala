package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators._

/** SURVEY §2 core: aggregations, dimension joins, pagination, top-k,
  * set ops, JSON/percentile/time-bucket rollups. */
object CoreRelational extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A2 — grouped pricing summary (TPC-H Q1 shape): group-by count +
    // exact decimal sums + derived avg. Single hash-agg shuffle.
    "a2_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J2 — multi-hop dimension join chain (record→spec→spec→spec analogue):
    // fact ⋈ three broadcast dims, revenue per region.
    "j2_revenue_by_region" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // O1 — keyset (cursor) pagination page: filter + TakeOrderedAndProject.
    "o1_keyset_page" -> ((s, dir) => {
      Pagination.keysetPage(t(s, dir, "orders"), "o_orderkey", Some(1000L), 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                col("o_totalprice"), day(col("o_orderdate")).as("o_day"))
    }),

    // P2+P3+P10 — IN-list + inclusive datetime-range filters, grouped count.
    "p3_filter_in_daterange" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(FilterOps.inList(col("o_orderstatus"), Seq("F", "P")) &&
               FilterOps.dateRange(col("o_orderdate"), Some("1996-01-01 00:00:00"), Some("1998-12-31 00:00:00")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // W1/W2 — priority-ordered top-k claim (TakeOrderedAndProject, no sort).
    "w1_ordered_claim" -> ((s, dir) => {
      TopK.orderedClaim(t(s, dir, "orders"),
          priority = col("o_orderpriority"), date = col("o_orderdate"),
          id = col("o_orderkey"), k = 50)
        .select(col("o_orderkey"), col("o_orderpriority"), day(col("o_orderdate")).as("o_day"))
    }),

    // J4/J11 — left outer join to a pre-aggregated subquery + COALESCE
    // defaults (dataset-list ⟕ record-count shape). Pre-aggregating before
    // the join keeps the shuffle at |customers| not |orders|.
    "j4_left_outer_counts" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val agg = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
      c.join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
                coalesce(col("cnt"), lit(0L)).as("n_orders"),
                coalesce(col("total"), lit(0.0)).as("total_price"))
        .orderBy(col("c_custkey"))
    }),

    // J5/J6/J12 — semi-join membership filter (children/dataset-membership).
    "j5_semi_join" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      su.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // J7 — submit anti-join: entry × spec matrix minus existing items.
    "j7_submit_anti" -> ((s, dir) => {
      val entries = t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("entry"))
      val specs = t(s, dir, "orders").select(col("o_orderpriority").as("spec")).distinct()
      val existing = t(s, dir, "orders")
        .select(col("o_custkey").as("entry"), col("o_orderpriority").as("spec")).distinct()
      JoinOps.submitMissing(entries, specs, existing, Seq("entry", "spec"))
        .orderBy(col("entry"), col("spec"))
    }),

    // A10/W3 — DISTINCT ON: first row per group by explicit order.
    "a10_distinct_on" -> ((s, dir) => {
      // hash-agg min_by form: map-side partial pick, no window sort
      AggOps.distinctOnAgg(t(s, dir, "lineitem"), Seq("l_partkey"),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
                day(col("l_shipdate")).as("ship_day"))
        .orderBy(col("l_partkey"))
    }),

    // A6 — multi-percentile summary per group (exact percentiles).
    "a6_percentile_summary" -> ((s, dir) => {
      AggOps.percentileSummary(t(s, dir, "events"), Seq("event_type"), "value")
        .orderBy(col("event_type"))
    }),

    // A7/F2 — UTC time-bucketed aggregation (day grain).
    "a7_time_buckets" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(AggOps.timeBucket(col("ts"), perHour = false).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy(col("d"), col("event_type"))
    }),

    // A8/F4 — JSON-extract numeric rollup per day.
    "a8_json_rollup" -> ((s, dir) =>
      AggOps.jsonSumByDay(t(s, dir, "events"), "ts", "props", "$.k")
        .orderBy(col("day"))),

    // A9 — per-group sorted distinct set as canonical CSV.
    "a9_collect_sorted" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), AggOps.sortedDistinctCsv(col("event_type")).as("types"))
        .orderBy(col("user_id"))
    }),

    // U — INTERSECT: customers who ordered in BOTH 1997 and 1998 (the
    // reference does intersection client-side with Python sets; the
    // engine form is one shuffle per side + hash semi-match).
    "u5_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def buyers(y: Int): DataFrame =
        o.filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
      buyers(1997).intersect(buyers(1998)).orderBy(col("o_custkey"))
    }),

    // U1+U3 — union of per-segment selections, set-minus recent purchasers.
    "u3_union_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey"))
      a.union(b).except(recent).orderBy(col("c_custkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a2_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "j2_revenue_by_region" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "o1_keyset_page" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_day
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey DESC
        |LIMIT 100""".stripMargin,

    "p3_filter_in_daterange" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1998-12-31 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "w1_ordered_claim" ->
      """SELECT o_orderkey, o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS o_day
        |FROM orders
        |ORDER BY o_orderpriority DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 50""".stripMargin,

    "j4_left_outer_counts" ->
      """SELECT c_custkey, COALESCE(cnt, 0) AS n_orders, COALESCE(total, 0.0) AS total_price
        |FROM customer
        |LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey
        |) agg ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "j5_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY s_suppkey""".stripMargin,

    "j7_submit_anti" ->
      """WITH entries AS (SELECT c_custkey AS entry FROM customer WHERE c_custkey % 10 = 0),
        |specs AS (SELECT DISTINCT o_orderpriority AS spec FROM orders),
        |existing AS (SELECT DISTINCT o_custkey AS entry, o_orderpriority AS spec FROM orders)
        |SELECT e.entry, s.spec
        |FROM entries e CROSS JOIN specs s
        |WHERE NOT EXISTS (SELECT 1 FROM existing x WHERE x.entry = e.entry AND x.spec = s.spec)
        |ORDER BY e.entry, s.spec""".stripMargin,

    "a10_distinct_on" ->
      """SELECT l_partkey, l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
        |ORDER BY l_partkey""".stripMargin,

    "a6_percentile_summary" ->
      """SELECT event_type, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.75) AS p75,
        |  quantile_cont(value, 0.95) AS p95
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "a7_time_buckets" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY d, event_type
        |ORDER BY d, event_type""".stripMargin,

    "a8_json_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS total
        |FROM events
        |GROUP BY day
        |ORDER BY day""".stripMargin,

    "a9_collect_sorted" ->
      """SELECT user_id, COUNT(*) AS n,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "u5_intersect" ->
      """SELECT o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |) t
        |ORDER BY o_custkey""".stripMargin,

    "u3_union_except" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  EXCEPT
        |  SELECT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        |) t
        |ORDER BY c_custkey""".stripMargin
  )
}
