package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AggOps, PivotOps}

/** SURVEY §2.10 X surface beyond X1: the reference's portal analytics
  * entry points.
  *
  *  - X2 `get_properties_df` (`qcportal/qcportal/dataset_models.py:
  *    2267-2314`): extract properties from a JSON column, pivot
  *    rows=entry × cols=(spec, property), drop all-null columns.
  *  - X3 value unpack (`dataset_models.py:2246-2256`): a struct-valued
  *    column fanned out into top-level columns.
  *  - X5 task-payload generation (`qcfractal/qcfractal/components/
  *    singlepoint/record_socket.py:52-99`): nested JSON document per
  *    claimed record over a record⋈molecule⋈spec join.
  */
object PivotAnalytics extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X2 — get_properties_df: records carry a JSON `properties` blob
    // (materialized here the same way X5 builds payloads); one complete
    // record is picked per (entry, spec) cell (A10 DISTINCT ON), then
    // price/okey are extracted columnar-ly and pivoted to spec-major
    // columns; the never-present property column is dropped all-null.
    "x2_properties_df" -> ((s, dir) => {
      val records = t(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderstatus"),
          to_json(struct(col("o_totalprice").as("price"),
            col("o_orderkey").as("okey"))).as("properties"))
      val picked = AggOps.distinctOn(records, Seq("o_custkey", "o_orderstatus"),
        Seq(get_json_object(col("properties"), "$.okey").cast("long").asc))
      val wide = PivotOps.propertiesDf(picked, "o_custkey", "o_orderstatus",
        "properties", Seq("price", "okey", "missing"), Seq("F", "O", "P"))
      // absent cells surfaced as -1.0 (not null) so the oracle compare is
      // exact — NaN breaks cross-engine equality
      PivotOps.dropAllNullCols(wide,
          Seq("F", "O", "P").map(v => s"${v}_missing"))
        .na.fill(-1.0)
        .orderBy(col("o_custkey"))
    }),

    // X3 — unpack: JSON parsed into a typed struct (from_json) plus a
    // computed struct, both fanned out to top-level columns.
    "x3_unpack" -> ((s, dir) => {
      val parsed = t(s, dir, "events").select(
        col("event_id"),
        from_json(col("props"), lit("k INT")).as("j"),
        struct((col("value") * 2).as("v2"),
          year(col("ts")).cast("long").as("y")).as("comp"))
      val once = PivotOps.unpack(parsed, "j", Seq("event_id", "comp"))
      PivotOps.unpack(once, "comp", Seq("event_id", "k"))
        .orderBy(col("event_id"))
    }),

    // X5 — task payload: one JSON input document per record over the
    // record⋈customer⋈nation join (both dims broadcast).
    "x5_task_payload" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"),
          to_json(struct(
            col("o_orderkey").as("id"),
            col("o_orderstatus").as("status"),
            col("c_name").as("customer"),
            col("n_name").as("nation"))).as("payload"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x2_properties_df" ->
      """WITH picked AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice AS price,
        |    CAST(o_orderkey AS DOUBLE) AS okey
        |  FROM orders WHERE o_custkey < 200
        |  QUALIFY row_number() OVER (
        |    PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderkey) = 1)
        |SELECT o_custkey,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'F' THEN price END), -1.0) AS F_price,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'F' THEN okey  END), -1.0) AS F_okey,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'O' THEN price END), -1.0) AS O_price,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'O' THEN okey  END), -1.0) AS O_okey,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'P' THEN price END), -1.0) AS P_price,
        |  COALESCE(MAX(CASE WHEN o_orderstatus = 'P' THEN okey  END), -1.0) AS P_okey
        |FROM picked
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "x3_unpack" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  value * 2 AS v2,
        |  CAST(year(ts) AS BIGINT) AS y
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "x5_task_payload" ->
      """SELECT o_orderkey,
        |  to_json(struct_pack(
        |    id := o_orderkey,
        |    status := o_orderstatus,
        |    customer := c_name,
        |    nation := n_name)) AS payload
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin
  )
}
