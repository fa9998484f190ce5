package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.TemporalJoins

/** Unit pins for the temporal join operators' contract edges — null
  * timestamps, column-name collisions, dotted names, unorderable payloads —
  * the cases the oracle queries (j15/j16, clean schemas, no nulls) can't
  * exercise.
  */
class TemporalJoinsSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: null right timestamps are never a match (SQL ASOF semantics)") {
    // right has one null-ts row with a distinctive payload; if it leaked
    // into the union it would sort first (nulls-first) and become the
    // running match for every early left row
    val left = Seq(
      (1L, "k1", ts("2024-01-01 00:05:00")),
      (2L, "k1", ts("2024-01-01 01:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("k1", Option(ts("2024-01-01 00:30:00")), 10L),
      ("k1", Option.empty[Timestamp], 999L)).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[Long])].collect()
    // id=1 precedes every real right ts → no match (null), NOT 999
    assert(out === Array((1L, None), (2L, Some(10L))))
  }

  test("asOfJoin: null left timestamps are preserved with no match") {
    val left = Seq(
      (1L, "k1", Option(ts("2024-01-01 01:00:00"))),
      (2L, "k1", Option.empty[Timestamp])).toDF("id", "k", "t")
    val right = Seq(("k1", ts("2024-01-01 00:30:00"), 10L)).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[Long])].collect()
    assert(out === Array((1L, Some(10L)), (2L, None)))
  }

  test("asOfJoin: rejects rightVals that collide with left column names") {
    val left = Seq((1L, "k1", ts("2024-01-01 00:05:00"), "x"))
      .toDF("id", "k", "t", "v")
    val right = Seq(("k1", ts("2024-01-01 00:00:00"), "y")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOfJoin: rejects unorderable (MAP) rightVals at the API boundary") {
    val left = Seq((1L, "k1", ts("2024-01-01 00:05:00"))).toDF("id", "k", "t")
    val right = Seq(("k1", ts("2024-01-01 00:00:00"), Map("a" -> 1L)))
      .toDF("k", "rt", "m")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("m"))
    }
    assert(e.getMessage.contains("orderable"))
  }

  test("asOfJoin: column names containing dots survive on BOTH sides") {
    val left = Seq((1L, "k1", ts("2024-01-01 00:05:00")))
      .toDF("my.id", "k", "t")
    val right = Seq(("k1", ts("2024-01-01 00:00:00"), 7L)).toDF("k", "rt", "my.v")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", "rt", Seq("my.v"))
    assert(out.columns.toSeq === Seq("my.id", "k", "t", "my.v"))
    val row = out.select(col("`my.id`"), col("`my.v`")).as[(Long, Long)].collect()
    assert(row === Array((1L, 7L)))
  }

  test("rangeJoinBinned: rejects pre-existing __bin and duplicate non-key names") {
    val pts = Seq(("k1", ts("2024-01-01 00:05:00"), 1L)).toDF("k", "t", "__bin")
    val ivs = Seq(("k1", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinBinned(pts, ivs, "k", "t", "s", "e", 3600L)
    }
    assert(e1.getMessage.contains("__bin"))

    val pts2 = Seq(("k1", ts("2024-01-01 00:05:00"), 1L)).toDF("k", "t", "x")
    val ivs2 = Seq(("k1", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L))
      .toDF("k", "s", "e", "x")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinBinned(pts2, ivs2, "k", "t", "s", "e", 3600L)
    }
    assert(e2.getMessage.contains("disjoint"))
  }
}
