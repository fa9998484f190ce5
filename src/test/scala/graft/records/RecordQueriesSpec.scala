package graft.records

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-assertion query tests in the reference's style
  * (`test_record_client_query.py`): exact counts for every filter shape,
  * cursor iteration, and limit clamping. */
class RecordQueriesSpec extends SparkSuite {

  lazy val records = Fixtures.records(spark).cache()
  lazy val edges = Fixtures.edges(spark)

  test("320 singlepoint + 7 service records") {
    assert(records.count() === 327)
    assert(records.filter(col("record_type") === "singlepoint").count() === 320)
  }

  test("status filter counts are exact") {
    val waiting = RecordQueries.query(records,
      RecordQueryFilters(status = Seq(RecordStatus.Waiting)))
    // ids 1..320 mod 7 == 4 (waiting is index 4) → 46 singlepoint + 1 service
    assert(waiting.count() ===
      records.filter(col("status") === "waiting").count())
  }

  test("type + manager + user filters compose") {
    val got = RecordQueries.query(records, RecordQueryFilters(
      recordType = Seq("singlepoint"),
      managerName = Seq("manager_1"),
      creatorUser = Seq("user_1")))
    val expected = records.filter(
      col("record_type") === "singlepoint" &&
      col("manager_name") === "manager_1" &&
      col("creator_user") === "user_1").count()
    assert(got.count() === expected)
  }

  test("created_on range is inclusive on both bounds") {
    val got = RecordQueries.query(records, RecordQueryFilters(
      createdAfter = Some("2024-02-05 00:00:00"),
      createdBefore = Some("2024-02-10 00:00:00")))
    val expected = records.filter(
      col("created_on") >= lit("2024-02-05 00:00:00").cast("timestamp") &&
      col("created_on") <= lit("2024-02-10 00:00:00").cast("timestamp")).count()
    assert(got.count() === expected)
  }

  test("cursor pagination walks the full set without gaps or dups") {
    var cursor: Option[Long] = None
    var total = 0L
    var seen = Set.empty[Long]
    var pages = 0
    var done = false
    while (!done && pages < 50) {
      val page = RecordQueries.query(records,
          RecordQueryFilters(cursor = cursor, limit = Some(100)))
        .select("record_id").collect().map(_.getLong(0))
      if (page.isEmpty) done = true
      else {
        assert(page.toSet.intersect(seen).isEmpty, "page overlap")
        seen ++= page.toSet
        total += page.length
        cursor = Some(page.min)
        pages += 1
      }
    }
    assert(total === 327)
  }

  test("limit clamps to server max") {
    val got = RecordQueries.query(records, RecordQueryFilters(limit = Some(5000)))
    assert(got.count() === 327) // under max, all rows
    assert(RecordQueries.MaxLimit === 1000)
  }

  test("parentId filter semi-joins the children edges") {
    val got = RecordQueries.query(records,
      RecordQueryFilters(parentId = Seq(1000L)), edges = Some(edges))
    assert(got.select("record_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("childId filter finds parents") {
    val got = RecordQueries.query(records,
      RecordQueryFilters(childId = Seq(5L)), edges = Some(edges))
    assert(got.select("record_id").collect().map(_.getLong(0)).toSet === Set(1001L))
  }

  test("hydrate preserves request order and projects includes") {
    val got = RecordQueries.hydrate(records, Seq(42L, 7L, 300L), include = Seq("status"))
    assert(got.columns.toSeq === Seq("record_id", "status"))
    assert(got.select("record_id").collect().map(_.getLong(0)).toSeq === Seq(42L, 7L, 300L))
  }

  test("O2 batch iterator walks all pages lazily, honors total limit") {
    import graft.operators.Pagination
    val pages = Pagination.batchIterator(records, "record_id", 100).toSeq
    assert(pages.map(_.size).sum === 327)
    assert(pages.forall(_.size <= 100))
    val ids = pages.flatten.map(_.getAs[Long]("record_id"))
    assert(ids.toSet.size === 327, "no dups across pages")

    val limited = Pagination.batchIterator(records, "record_id", 100,
      totalLimit = Some(250)).toSeq
    assert(limited.map(_.size).sum === 250)
  }

  test("P1 include/exclude wildcards resolve like the reference") {
    import RecordQueries.resolveProjection
    val all = Seq("record_id", "a", "b", "blob")
    val defaults = Seq("record_id", "a", "b")
    assert(resolveProjection(all, defaults, "record_id", Nil, Nil) === defaults)
    assert(resolveProjection(all, defaults, "record_id", Seq("*"), Nil) === defaults)
    assert(resolveProjection(all, defaults, "record_id", Seq("**"), Nil) === all)
    assert(resolveProjection(all, defaults, "record_id", Seq("a"), Nil) ===
      Seq("record_id", "a"))
    assert(resolveProjection(all, defaults, "record_id", Seq("*", "blob"), Nil) === all)
    // exclude wins over include, but never removes the pk
    assert(resolveProjection(all, defaults, "record_id", Nil, Seq("b", "record_id")) ===
      Seq("record_id", "a"))
    assert(resolveProjection(all, defaults, "record_id", Seq("**"), Seq("blob")) ===
      defaults)
  }

  test("hydrate honors exclude and default columns") {
    val got = RecordQueries.hydrate(records, Seq(1L, 2L),
      exclude = Seq("manager_name", "creator_user", "created_on", "modified_on",
        "is_service", "specification_id", "molecule_id"))
    assert(got.columns.toSeq === Seq("record_id", "record_type", "status"))
  }
}
