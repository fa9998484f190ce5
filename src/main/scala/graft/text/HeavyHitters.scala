package graft.text

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator — corpus
  * heavy hitters with BOUNDED state, the scale path for "top tokens over
  * 100 TB" where a full `groupBy(token).count` would shuffle the entire
  * token stream. Each map task keeps at most `m` counters (classic MG
  * insert: decrement-all when full), partials merge associatively by
  * counter summation followed by an (m+1)-th-largest rebase (Agarwal et
  * al., "Mergeable Summaries" — the merged sketch keeps the MG error
  * bound), so only O(m) rows per task cross the shuffle.
  *
  * Guarantees: every item with true count > N/(m+1) is present, and each
  * reported count is an UNDERestimate by at most N/(m+1) (N = stream
  * length). When `m` is at least the number of distinct items no
  * decrement ever fires and the sketch is EXACT — which is how the
  * tx_heavy_hitters query anchors to a DuckDB oracle: capacity sized
  * above the test vocabulary pins exact counts, the unit suite pins the
  * under-capacity error bound, and at 100 TB the same plan runs with
  * whatever m memory affords.
  */
class HeavyHitters(m: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(m >= 1, s"sketch capacity must be >= 1, got $m")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < m => b.updated(tok, 1L)
      case None =>
        // classic MG: a full sketch meeting a new item decrements every
        // counter (the new item's implicit counter hits 0 and is dropped)
        b.iterator.map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // rebase by the (m+1)-th largest counter: the merged sketch keeps
      // at most m items and stays within the MG error bound
      val pivot = sum.valuesIterator.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
      sum.iterator.map { case (t, c) => (t, c - pivot) }
        .filter(_._2 > 0L).toMap
    }
  }

  def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HeavyHitters {
  /** Convenience: the sketch as an untyped Column over a string column,
    * for `DataFrame.agg`. */
  def sketch(m: Int): org.apache.spark.sql.TypedColumn[String, Seq[(String, Long)]] =
    new HeavyHitters(m).toColumn
}
