package graft

import org.apache.spark.sql.functions._

import graft.records.{AccessGeo, DatasetOps}

/** Dataset copy/clone semantics (`base_dataset_socket.py:1652-1872`) and
  * the geo enrichment join (`serverinfo/socket.py:215-280`). */
class DatasetCopySpec extends SparkSuite {
  import spark.implicits._

  private val specs = Seq(
    (1L, "s0", 10L), (1L, "s1", 11L), (1L, "s2", 12L),
    (2L, "s0", 10L), (2L, "s5", 15L))
    .toDF("dataset_id", "name", "specification_id")

  test("copy_specifications skips same-(name,id) pairs, copies the rest") {
    val out = DatasetOps.copySpecifications(specs, 1L, 2L)
      .filter(col("dataset_id") === 2L)
      .select("name", "specification_id").as[(String, Long)].collect().toSet
    // s0 was already present (same id — skipped, NOT duplicated);
    // s1, s2 copied; s5 untouched
    assert(out === Set(("s0", 10L), ("s1", 11L), ("s2", 12L), ("s5", 15L)))
  }

  test("copy_specifications fails loudly on a name bound to a different id") {
    val clash = specs.union(Seq((2L, "s1", 99L))
      .toDF("dataset_id", "name", "specification_id"))
    val e = intercept[IllegalArgumentException] {
      DatasetOps.copySpecifications(clash, 1L, 2L)
    }
    assert(e.getMessage.contains("different specification_id"))
  }

  test("copy_entries fails on any name collision; name subset respected") {
    val entries = Seq((1L, "e1", 100L), (1L, "e2", 200L), (2L, "e2", 999L))
      .toDF("dataset_id", "name", "molecule_id")
    val e = intercept[IllegalArgumentException] {
      DatasetOps.copyEntries(entries, 1L, 2L)
    }
    assert(e.getMessage.contains("already exist"))
    // restricting to non-colliding names succeeds
    val out = DatasetOps.copyEntries(entries, 1L, 2L, Some(Seq("e1")))
      .filter(col("dataset_id") === 2L)
      .select("name", "molecule_id").as[(String, Long)].collect().toSet
    assert(out === Set(("e1", 100L), ("e2", 999L)))
  }

  test("copy_record_items rewrites links without duplicating records") {
    val items = Seq((1L, "e1", "s0", 500L), (1L, "e2", "s1", 501L))
      .toDF("dataset_id", "entry_name", "specification_name", "record_id")
    val out = DatasetOps.copyRecordItems(items, 1L, 2L)
    assert(out.count() === 4)
    // both datasets point at the SAME record ids — no new records
    val ids = out.select("record_id").distinct().as[Long].collect().toSet
    assert(ids === Set(500L, 501L))
    val spec = DatasetOps.copyRecordItems(items, 1L, 2L,
      specNames = Some(Seq("s0")))
    assert(spec.filter(col("dataset_id") === 2L).count() === 1)
  }

  test("geo enrichment: covered ips resolve, uncovered ips keep NULL geo") {
    val geo = Seq((0L, 99L, "AA", "r0"), (200L, 299L, "BB", "r1"))
      .toDF("ip_lo", "ip_hi", "country_code", "subdivision")
    // prefixBits 28 → bucket width 16: the [0,99] range spans 7 buckets
    val pg = AccessGeo.splitByPrefix(geo, prefixBits = 28)
    val acc = Seq((1L, 50L), (2L, 150L), (3L, 250L)).toDF("id", "ip")
    val out = AccessGeo.geoEnrich(acc, col("ip"), pg, prefixBits = 28)
      .select("id", "country_code").as[(Long, Option[String])]
      .collect().toMap
    assert(out === Map(1L -> Some("AA"), 2L -> None, 3L -> Some("BB")))
  }

  test("splitByPrefix tiles ranges exactly: no gaps, no overlaps") {
    val geo = Seq((0L, 1023L, "AA", "r0")).toDF("ip_lo", "ip_hi",
      "country_code", "subdivision")
    val pg = AccessGeo.splitByPrefix(geo, prefixBits = 24) // width 256
    val rows = pg.select("prefix", "lo", "hi")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(rows.length === 4)
    assert(rows.head._2 === 0L && rows.last._3 === 1023L)
    // contiguous, bucket-aligned
    rows.sliding(2).foreach { case Array(a, b) => assert(b._2 === a._3 + 1) }
    rows.foreach { case (p, lo, hi) =>
      assert(lo >> 8 === p && hi >> 8 === p, "each piece must stay in one bucket")
    }
  }
}
