package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — as-of and range joins, the two join shapes a
  * time-series/event workload needs that plain equi-joins can't express.
  * Spark has no native ASOF JOIN (DuckDB/Pandas do) and a naive
  * `l.join(r, l("t") >= r("t") && ...)` inequality join degrades to a
  * broadcast-nested-loop — quadratic per key and a non-starter at scale.
  * Both operators here compile to ONE equi-shuffle each:
  *
  *  - [[asOfJoin]]: union both sides tagged, one shuffle+sort per key,
  *    running `last(ignoreNulls)` window carries the most recent right
  *    row forward onto each left row — the distributed merge-join form of
  *    as-of (the same shape kdb/QuestDB/Flink temporal joins execute).
  *  - [[rangeJoinBinned]]: intervals explode into fixed-width time bins,
  *    points map to exactly one bin, the join runs equi on (key, bin) and
  *    the exact interval predicate filters afterwards — candidate volume
  *    is bounded by interval-span/binWidth per interval, never n².
  */
object TemporalJoins {

  /** Backward (most-recent-at-or-before) as-of join.
    *
    * For every left row, attaches `rightVals` from the right row with the
    * greatest `rightTs` <= the left row's `leftTs` within the same `key`
    * group (inclusive match at equal timestamps), or nulls when no right
    * row precedes it. Left rows are always preserved (left-outer
    * semantics).
    *
    * Mechanics: right rows are tagged side=0, left rows side=1, unioned,
    * then a single window `partitionBy(key).orderBy(ts, side, payload)`
    * with a running UnboundedPreceding..CurrentRow frame computes
    * `last(rightPayload, ignoreNulls)` — at equal timestamps the right
    * row sorts first (side 0 < 1) so the left row sees it, giving the
    * inclusive `>=` contract. If several right rows share (key, ts) the
    * greatest payload struct wins (deterministic; pre-aggregate the right
    * side to unique (key, ts) when a different tie-break is wanted).
    *
    * Scale shape: ONE hash exchange on `key` plus the in-partition sort —
    * no join node at all, no per-key quadratic blowup, and the running
    * frame is O(1) memory per row in WindowExec. A permanently hot key
    * serializes into one task's sort (same caveat as any keyed window);
    * pre-split such keys upstream if they exist.
    *
    * Null timestamps follow SQL ASOF semantics: right rows with null
    * `rightTs` can never be "the most recent at-or-before" anything and
    * are dropped before the union; left rows with null `leftTs` are
    * preserved with null `rightVals` (they sort before every real-ts
    * right row, so the running frame has seen no right payload yet).
    *
    * `rightVals` must not collide with left column names (the output
    * would carry two columns with the same name) and must all be
    * orderable types (the (ts, payload) tie-break sorts the payload
    * struct — a MAP column would fail analysis deep inside WindowExec
    * with an obscure error, so it is rejected here instead). When several
    * right rows share (key, ts), the greatest payload struct wins under
    * the `rightVals` ordering the caller passed; pre-aggregate the right
    * side to unique (key, ts) for any other tie-break.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightVals, forward = false)

  /** Forward (earliest-at-or-after) as-of join — the mirror of
    * [[asOfJoin]]: for every left row, attaches `rightVals` from the
    * right row with the SMALLEST `rightTs` >= the left row's `leftTs`
    * within the same `key` group (inclusive at equal timestamps), or
    * nulls when no right row follows it. The "next event after" shape:
    * conversion lag, next-reading-after-calibration, SLA attribution.
    *
    * Same single-exchange mechanics and guards as [[asOfJoin]], with the
    * window frame reversed (CurrentRow..UnboundedFollowing, running
    * `first(ignoreNulls)`). Tie-break asymmetry is inherent to the sort
    * direction: when several right rows share (key, ts), the LEAST
    * payload struct wins here (the greatest wins in the backward join);
    * pre-aggregate the right side to unique (key, ts) for any other
    * tie-break. Null handling matches SQL ASOF: null `rightTs` rows can
    * never match and are dropped; null `leftTs` rows are preserved with
    * null `rightVals` — routed AROUND the window here, because under the
    * nulls-first sort a null-ts left row would otherwise see every right
    * row in its following frame. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightVals, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String], forward: Boolean): DataFrame = {
    val lCols = left.columns.toIndexedSeq
    val overlap = rightVals.toSet.intersect(lCols.toSet)
    require(overlap.isEmpty,
      s"rightVals collide with left column names: ${overlap.mkString(", ")} — alias them first")
    // backtick-quoted refs EVERYWHERE a caller-supplied name is resolved:
    // a column name containing dots must be a literal lookup, not a
    // nested-field path — on both sides, not just the left
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    val rvType = org.apache.spark.sql.types.StructType(
      right.select(rightVals.map(q): _*).schema.map(_.copy(nullable = true)))
    require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rvType),
      s"rightVals must be orderable types (no MAP); got ${rvType.simpleString}")
    val lType = org.apache.spark.sql.types.StructType(
      left.schema.map(_.copy(nullable = true)))
    // at equal timestamps the right row must fall INSIDE the left row's
    // frame: before it for the backward running frame, after it for the
    // forward one — hence the side tags swap with the direction
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left.select(q(key).as("__k"), q(leftTs).as("__t"),
      lit(lSide).as("__side"), lit(null).cast(rvType).as("__rv"),
      struct(lCols.map(q): _*).as("__lrow"))
    // null rightTs is never an as-of match — dropping it here also makes
    // the nulls-first sort safe for the backward frame: the only null-__t
    // rows left are left-side rows, which see an empty preceding frame
    val r = right.filter(q(rightTs).isNotNull)
      .select(q(key).as("__k"), q(rightTs).as("__t"),
        lit(rSide).as("__side"), struct(rightVals.map(q): _*).as("__rv"),
        lit(null).cast(lType).as("__lrow"))
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__rv").asc)
    val matched =
      if (forward) {
        // null-ts left rows sort first under asc and would see EVERY
        // right row in their following frame — route them around the
        // window with a null payload instead
        val w = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        r.unionByName(l.filter(col("__t").isNotNull))
          .withColumn("__asof", first(col("__rv"), ignoreNulls = true).over(w))
          .unionByName(l.filter(col("__t").isNull)
            .withColumn("__asof", lit(null).cast(rvType)))
      } else {
        val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        r.unionByName(l)
          .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      }
    matched
      .filter(col("__side") === lSide)
      // getField (not dotted col strings): left column names containing
      // dots must resolve as literal struct fields, not nested paths
      .select(lCols.map(c => col("__lrow").getField(c).as(c)) ++
        rightVals.map(v => col("__asof").getField(v).as(v)): _*)
  }

  /** Interval (range) join: points (key, t) x intervals (key, [start, end))
    * matched by containment, without an inequality join.
    *
    * Both sides bucket time into `binWidthSec`-wide bins: an interval
    * lands in every bin its half-open span touches (explode, at most
    * span/binWidth + 1 rows), a point lands in exactly ONE bin — so the
    * equi-join on (key, bin) sees each (point, interval) pair at most
    * once and no distinct/dedup pass is needed. The exact
    * `start <= t < end` predicate then drops same-bin near misses.
    * Returns point columns + interval columns, inner-join semantics.
    *
    * Choose `binWidthSec` on the order of the typical interval span: the
    * candidate fan-out per interval is ceil(span/binWidth) + 1, and a bin
    * too fine multiplies the interval side while a bin too coarse admits
    * more false candidates per bucket. Cost is one shuffle on (key, bin)
    * either way — the plan stays a plain equi sort-merge/hash join that
    * AQE can size, skew-split, or broadcast.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
                      tCol: String, startCol: String, endCol: String,
                      binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, s"binWidthSec must be positive, got $binWidthSec")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not already carry a __bin column (it would be silently replaced)")
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet.filterNot(_ == key))
    require(shared.isEmpty,
      s"non-key column names must be disjoint (output would duplicate: ${shared.mkString(", ")})")
    val w = lit(binWidthSec * 1000000L) // micros
    // explicit plan aliases: both sides often derive from the same source
    // table, and unqualified column refs would resolve trivially-true
    val p = points.withColumn("__bin", floor(unix_micros(col(tCol)) / w))
      .alias("__p")
    // half-open interval: the last covered bin is the one holding end-1μs;
    // empty/inverted intervals (end <= start) produce no bins and drop out
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor((unix_micros(col(endCol)) - 1L) / w))))
      .alias("__i")
    p.join(i, col("__p.__bin") === col("__i.__bin") &&
        col(s"__p.$key") === col(s"__i.$key"))
      .filter(col(s"__p.$tCol") >= col(s"__i.$startCol") &&
        col(s"__p.$tCol") < col(s"__i.$endCol"))
      .select(points.columns.toIndexedSeq.map(c => col(s"__p.$c")) ++
        intervals.columns.filter(_ != key).map(c => col(s"__i.$c")): _*)
  }
}
