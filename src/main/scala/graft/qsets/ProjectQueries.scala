package graft.qsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.records.ProjectOps

/** Project-scoped query surface (SURVEY §2 J20/A14) — the reference's
  * `project_socket.query_project_records` / `query_project_datasets` /
  * `status` (`qcfractal/qcfractal/components/project_socket.py:245,280,317`)
  * composed from the membership and status machinery.
  *
  * Derivations (all deterministic over the driver tables):
  *  - projects ← region (project_id = r_regionkey, 'proj_' + lower name);
  *  - record membership ← orders: every 7th record joins project
  *    (o_custkey mod 5); every 21st ALSO joins project (o_custkey+1 mod 5)
  *    under a distinct in-project name — records can belong to several
  *    projects, like the reference's link table;
  *  - dataset membership ← nation (datasets 0..9, project = n_regionkey,
  *    so a project owns ~2 datasets and some datasets are item-less);
  *  - dataset items ← lineitem (dataset_id = l_suppkey mod 10).
  */
object ProjectQueries extends QuerySet {

  private def projects(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select(
      col("r_regionkey").cast("long").as("project_id"),
      concat(lit("proj_"), lower(col("r_name"))).as("project_name"))

  private def recordMembers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val first = o.filter(col("o_orderkey") % 7 === 0).select(
      col("o_orderkey").as("record_id"),
      (col("o_custkey") % 5).as("project_id"),
      concat(lit("rec"), col("o_orderkey")).as("record_name"))
    val second = o.filter(col("o_orderkey") % 21 === 0).select(
      col("o_orderkey").as("record_id"),
      ((col("o_custkey") + 1) % 5).as("project_id"),
      concat(lit("rec"), col("o_orderkey"), lit("b")).as("record_name"))
    first.unionByName(second)
  }

  private def datasetMembers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").filter(col("n_nationkey") < 10).select(
      col("n_nationkey").cast("long").as("dataset_id"),
      col("n_regionkey").cast("long").as("project_id"),
      concat(lit("ds_"), lower(col("n_name"))).as("dataset_name"))

  private def datasetItems(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      (col("l_suppkey") % 10).as("dataset_id"),
      col("l_orderkey").as("record_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J20 — which projects do these records belong to (name-resolved).
    "j20_project_records" -> ((s, dir) => {
      ProjectOps.queryProjectRecords(
        recordMembers(s, dir), projects(s, dir),
        Seq(7L, 21L, 42L, 84L, 7007L, 999999999L))
        .orderBy(col("record_id"), col("project_id"), col("record_name"))
    }),

    // J20b — same surface over the dataset membership (incl. a missing id).
    "j20_project_datasets" -> ((s, dir) => {
      ProjectOps.queryProjectDatasets(
        datasetMembers(s, dir), projects(s, dir), Seq(0L, 2L, 4L, 6L, 99L))
        .orderBy(col("dataset_id"))
    }),

    // A14 — per-project status: directly-linked record statuses plus the
    // summed overall status of every member dataset (item-link counts).
    "a14_project_status" -> ((s, dir) => {
      ProjectOps.status(1L, recordMembers(s, dir), datasetMembers(s, dir),
        datasetItems(s, dir), RecordsShaped.records(s, dir))
        .orderBy(col("section"), col("status"))
    }))

  def oracleSql: Map[String, String] = Map(

    "j20_project_records" ->
      """WITH memb AS (
        |  SELECT o_orderkey AS record_id,
        |    CAST(o_custkey % 5 AS BIGINT) AS project_id,
        |    'rec' || CAST(o_orderkey AS VARCHAR) AS record_name
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CAST((o_custkey + 1) % 5 AS BIGINT),
        |    'rec' || CAST(o_orderkey AS VARCHAR) || 'b'
        |  FROM orders WHERE o_orderkey % 21 = 0),
        |proj AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS project_id,
        |    'proj_' || lower(r_name) AS project_name
        |  FROM region)
        |SELECT m.record_id, m.project_id, p.project_name, m.record_name
        |FROM memb m JOIN proj p ON p.project_id = m.project_id
        |WHERE m.record_id IN (7, 21, 42, 84, 7007, 999999999)
        |ORDER BY m.record_id, m.project_id, m.record_name""".stripMargin,

    "j20_project_datasets" ->
      """WITH dsm AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS dataset_id,
        |    CAST(n_regionkey AS BIGINT) AS project_id,
        |    'ds_' || lower(n_name) AS dataset_name
        |  FROM nation WHERE n_nationkey < 10),
        |proj AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS project_id,
        |    'proj_' || lower(r_name) AS project_name
        |  FROM region)
        |SELECT d.dataset_id, d.project_id, p.project_name, d.dataset_name
        |FROM dsm d JOIN proj p USING (project_id)
        |WHERE d.dataset_id IN (0, 2, 4, 6, 99)
        |ORDER BY dataset_id""".stripMargin,

    "a14_project_status" ->
      """WITH memb AS (
        |  SELECT o_orderkey AS record_id,
        |    CAST(o_custkey % 5 AS BIGINT) AS project_id
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST((o_custkey + 1) % 5 AS BIGINT)
        |  FROM orders WHERE o_orderkey % 21 = 0),
        |rec AS (
        |  SELECT o_orderkey AS record_id,
        |    CASE o_orderstatus WHEN 'F' THEN 'complete'
        |      WHEN 'P' THEN 'running' ELSE 'waiting' END AS status
        |  FROM orders),
        |dsm AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS dataset_id,
        |    CAST(n_regionkey AS BIGINT) AS project_id
        |  FROM nation WHERE n_nationkey < 10),
        |items AS (
        |  SELECT CAST(l_suppkey % 10 AS BIGINT) AS dataset_id,
        |    l_orderkey AS record_id
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'records' AS section, r.status, COUNT(*) AS n
        |  FROM memb m JOIN rec r ON r.record_id = m.record_id
        |  WHERE m.project_id = 1
        |  GROUP BY r.status
        |  UNION ALL
        |  SELECT 'datasets', r.status, COUNT(*)
        |  FROM items i JOIN rec r ON r.record_id = i.record_id
        |  WHERE i.dataset_id IN (SELECT dataset_id FROM dsm WHERE project_id = 1)
        |  GROUP BY r.status)
        |ORDER BY section, status""".stripMargin)
}
