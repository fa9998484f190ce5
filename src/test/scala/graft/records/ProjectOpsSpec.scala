package graft.records

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkSuite

/** Project-scoped query surface (`project_socket.py:245-347`):
  * name-resolved membership lookups and the two-section status rollup. */
class ProjectOpsSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def projects = Seq(
    (0L, "proj_a"), (1L, "proj_b"), (2L, "proj_c"))
    .toDF("project_id", "project_name")

  // record 10 belongs to two projects under different in-project names —
  // the reference's link table allows that (unique per (project, name))
  private def recMembers = Seq(
    (10L, 0L, "alpha"), (10L, 1L, "alpha-shared"),
    (11L, 1L, "beta"), (12L, 2L, "gamma"))
    .toDF("record_id", "project_id", "record_name")

  private def dsMembers = Seq(
    (100L, 0L, "ds-x"), (101L, 1L, "ds-y"), (102L, 1L, "ds-empty"))
    .toDF("dataset_id", "project_id", "dataset_name")

  // dataset 102 has NO items; dataset 101 links record 11 twice (two
  // entry×spec cells) — overall_status counts item LINKS, so 11's status
  // counts twice
  private def dsItems = Seq(
    (100L, 10L), (101L, 11L), (101L, 11L), (101L, 12L))
    .toDF("dataset_id", "record_id")

  private def records = Seq(
    (10L, "complete"), (11L, "error"), (12L, "complete"))
    .toDF("record_id", "status")

  test("queryProjectRecords resolves names; missing ids drop out") {
    val out = ProjectOps.queryProjectRecords(
      recMembers, projects, Seq(10L, 12L, 999L))
      .orderBy("record_id", "project_id")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out === Seq(
      (10L, 0L, "proj_a", "alpha"),
      (10L, 1L, "proj_b", "alpha-shared"),
      (12L, 2L, "proj_c", "gamma")))
  }

  test("queryProjectDatasets resolves names") {
    val out = ProjectOps.queryProjectDatasets(
      dsMembers, projects, Seq(101L, 102L, 7L))
      .orderBy("dataset_id")
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out === Seq(
      (101L, 1L, "proj_b", "ds-y"),
      (102L, 1L, "proj_b", "ds-empty")))
  }

  test("status: records section counts links, datasets section counts item links") {
    val out = ProjectOps.status(1L, recMembers, dsMembers, dsItems, records)
      .orderBy("section", "status")
      .as[(String, String, Long)].collect().toSeq
    // project 1: direct records {10 complete, 11 error}; datasets {101, 102}
    // → items (11 error ×2, 12 complete ×1), 102 contributes nothing
    assert(out === Seq(
      ("datasets", "complete", 1L),
      ("datasets", "error", 2L),
      ("records", "complete", 1L),
      ("records", "error", 1L)))
  }

  test("status of a project with no members is empty, not an error") {
    assert(ProjectOps.status(99L, recMembers, dsMembers, dsItems, records)
      .count() === 0L)
  }

  test("membership lookups broadcast the project dimension") {
    val plan = ProjectOps.queryProjectRecords(recMembers, projects, Seq(10L))
      .queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, s"expected a broadcast hash join:\n$plan")
  }
}
