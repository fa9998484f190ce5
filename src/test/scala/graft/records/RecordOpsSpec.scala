package graft.records

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit coverage for the round-2 records operators: cache refresh
  * semantics, return-path merge, revert stack, tag-ordered claim. */
class RecordOpsSpec extends SparkSuite {

  import spark.implicits._

  test("cache refresh: current rows kept, stale refetched, missing added") {
    val server = Seq(
      (1L, "2024-01-02 00:00:00", "v1-new"),
      (2L, "2024-01-01 00:00:00", "v2"),
      (3L, "2024-01-01 00:00:00", "v3")).toDF("id", "ver_s", "payload")
      .withColumn("ver", col("ver_s").cast("timestamp")).drop("ver_s")
      .select("id", "ver", "payload")
    val cache = Seq(
      (1L, "2024-01-01 00:00:00", "v1-stale"),   // older than server → refetch
      (2L, "2024-01-01 00:00:00", "v2-cached"),  // current → keep verbatim
      (9L, "2024-01-01 00:00:00", "local-only")) // not on server → keep
      .toDF("id", "ver_s", "payload")
      .withColumn("ver", col("ver_s").cast("timestamp")).drop("ver_s")
      .select("id", "ver", "payload")
    val got = CacheOps.refresh(cache, server, "id", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(1L -> "v1-new", 2L -> "v2-cached", 3L -> "v3", 9L -> "local-only"))
  }

  test("applyFinished merges results, untouched records pass through") {
    val records = Seq((1L, "waiting"), (2L, "waiting"), (3L, "complete"))
      .toDF("record_id", "status")
    val results = Seq((1L, "complete")).toDF("record_id", "new_status")
    val got = RecordOps.applyFinished(records, results)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "complete", 2L -> "waiting", 3L -> "complete"))
  }

  test("revertToPrevious picks the rank-2 history entry, skips singletons") {
    val history = Seq(
      (1L, 1, "waiting"), (1L, 2, "running"), (1L, 3, "error"),
      (2L, 1, "waiting")).toDF("record_id", "seq", "status")
    val got = RecordOps.revertToPrevious(history)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "running"))
  }

  test("claimTagOrdered: earlier tags win; '*' ranks all tags equally") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val tasks = Seq(
      (1L, true, "tag_a", 1, ts, Seq("p")),
      (2L, true, "tag_b", 9, ts, Seq("p")),   // higher priority, later tag
      (3L, true, "tag_a", 5, ts, Seq("p")),
      (4L, true, "tag_c", 9, ts, Seq("p")))   // unserved tag
      .toDF("task_id", "available", "compute_tag", "compute_priority",
        "sort_date", "required_programs")
    val ordered = TaskOps.claimTagOrdered(tasks, Seq("p"), Seq("tag_a", "tag_b"), 10)
      .select("task_id").collect().map(_.getLong(0)).toSeq
    // tag_a first (priority desc within), then tag_b; tag_c excluded
    assert(ordered === Seq(3L, 1L, 2L))

    val wild = TaskOps.claimTagOrdered(tasks, Seq("p"), Seq("*"), 10)
      .select("task_id").collect().map(_.getLong(0)).toSeq
    // equal rank → priority desc, id asc
    assert(wild === Seq(2L, 4L, 3L, 1L))
  }
}
