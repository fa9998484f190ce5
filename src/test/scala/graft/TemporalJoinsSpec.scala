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

  test("asOfJoinForward: inclusive next-match, null left ts routed around the window") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 00:30:00")),         // next purchase at 00:30 (tie, inclusive)
      (2L, "k1", ts("2024-01-01 02:00:00")),         // nothing after → null
      (3L, "k1", null.asInstanceOf[Timestamp])       // null ts → null match, row preserved
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", Option(ts("2024-01-01 00:30:00")), 10L),
      ("k1", Option(ts("2024-01-01 00:05:00")), 5L), // earlier — must NOT match forward
      ("k1", Option.empty[Timestamp], 999L)          // null ts never matches
    ).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoinForward(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[Long])].collect()
    assert(out === Array((1L, Some(10L)), (2L, None), (3L, None)))
  }

  // ---- randomized equivalence vs a driver-side brute-force reference ----
  // The oracle queries (j15/j16) pin ONE clean dataset; these sweep many
  // seeded random shapes — timestamp ties, null timestamps, keys missing
  // from one side, bin-boundary-straddling intervals — against an
  // independent O(n·m) implementation of the documented contract.

  private def seededRng(seed: Long) = new scala.util.Random(seed)

  test("asOfJoin matches brute force on seeded random data (ties, nulls, key gaps)") {
    for (seed <- 0 until 8) {
      val rng = seededRng(seed.toLong)
      // coarse timestamp grid (0..19 seconds) forces plenty of exact ties
      def randTs(): Option[Timestamp] =
        if (rng.nextInt(10) == 0) None
        else Some(new Timestamp(rng.nextInt(20) * 1000L))
      val keys = Vector("a", "b", "c")
      val left = (1 to 40).map(i =>
        (i.toLong, keys(rng.nextInt(keys.size)), randTs().orNull))
      val right = (1 to 30).map(_ =>
        (keys(rng.nextInt(keys.size)), randTs().orNull, rng.nextInt(5).toLong))
      val l = left.toDF("id", "k", "t")
      val r = right.toDF("k", "rt", "v")
      val rows = TemporalJoins.asOfJoin(l, r, "k", "t", "rt", Seq("v"))
        .select(col("id"), col("v")).collect()
      // exactly one output row per left row — a tie-break regression that
      // duplicated rows would vanish inside toMap without this
      assert(rows.length === left.size, s"asOfJoin cardinality at seed=$seed")
      val got = rows
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
        .toMap
      // brute force per documented contract: greatest rightTs <= leftTs
      // within the key; null rightTs never matches; null leftTs never
      // matches; ties on rightTs break by greatest payload
      val want = left.map { case (id, k, t) =>
        val m = Option(t).flatMap { lt =>
          val cands = right.filter { case (rk, rt, _) =>
            rk == k && rt != null && !rt.after(lt) }
          if (cands.isEmpty) None
          else {
            val maxTs = cands.map(_._2.getTime).max
            Some(cands.filter(_._2.getTime == maxTs).map(_._3).max)
          }
        }
        id -> m
      }.toMap
      assert(got === want, s"asOfJoin mismatch at seed=$seed")

      // forward direction over the same data, against the mirrored brute
      // force: smallest rightTs >= leftTs; ties break by LEAST payload
      val fRows = TemporalJoins.asOfJoinForward(l, r, "k", "t", "rt", Seq("v"))
        .select(col("id"), col("v")).collect()
      assert(fRows.length === left.size, s"asOfJoinForward cardinality at seed=$seed")
      val fGot = fRows
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
        .toMap
      val fWant = left.map { case (id, k, t) =>
        val m = Option(t).flatMap { lt =>
          val cands = right.filter { case (rk, rt, _) =>
            rk == k && rt != null && !rt.before(lt) }
          if (cands.isEmpty) None
          else {
            val minTs = cands.map(_._2.getTime).min
            Some(cands.filter(_._2.getTime == minTs).map(_._3).min)
          }
        }
        id -> m
      }.toMap
      assert(fGot === fWant, s"asOfJoinForward mismatch at seed=$seed")
    }
  }

  test("rangeJoinBinned matches brute force on seeded random data (boundaries, empties)") {
    for (seed <- 0 until 8) {
      val rng = seededRng(100L + seed)
      val keys = Vector("a", "b")
      // second-granularity points; bin width deliberately NOT aligned to
      // the value grid so intervals straddle bin boundaries
      val pts = (1 to 40).map(i =>
        (i.toLong, keys(rng.nextInt(keys.size)), new Timestamp(rng.nextInt(120) * 1000L)))
      val ivs = (1 to 15).map { i =>
        val s = rng.nextInt(120)
        // includes empty (len=0) and inverted (len<0) intervals → no bins
        val len = rng.nextInt(40) - 5
        (1000L + i, keys(rng.nextInt(keys.size)),
          new Timestamp(s * 1000L), new Timestamp((s + len) * 1000L))
      }
      val p = pts.toDF("pid", "k", "t")
      val iv = ivs.toDF("iid", "k", "s", "e")
      val rows = TemporalJoins.rangeJoinBinned(p, iv, "k", "t", "s", "e", binWidthSec = 7L)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        (pid, pk, t) <- pts
        (iid, ik, s, e) <- ivs
        if pk == ik && !t.before(s) && t.before(e) // start <= t < end
      } yield (pid, iid)).toSet
      // each matching pair exactly ONCE — a regression emitting one row
      // per overlapped bin would survive a set-only compare
      assert(rows.length === want.size, s"rangeJoinBinned cardinality at seed=$seed")
      assert(rows.toSet === want, s"rangeJoinBinned mismatch at seed=$seed")
    }
  }
}
