package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k-by-hash (hash, value) aggregate — the uniform-sample
  * sketch state behind the quantile estimator.
  *
  * Keeps the k pairs that are smallest under (hash, value) order,
  * DUPLICATES PRESERVED: unlike [[MinKHashes]] (a distinct-set sketch)
  * this samples the input MULTISET — rows that share a selection hash
  * (hash collisions, or genuine duplicate rows hashed on a non-unique
  * key) each keep their own slot, so the sample never silently dedups
  * the population it is meant to profile. Ordering by the (hash, value)
  * PAIR keeps the selection a pure function of the input multiset even
  * when hashes tie — any engine replaying "k smallest by (hash, value)"
  * selects the same values.
  *
  * The hash is uniform over rows, so the surviving values are a
  * deterministic uniform without-replacement row sample of the group,
  * and the buffer is k-bounded through partial aggregation: every map
  * task ships at most k pairs per group — a quantile profile of a
  * 100 TB group is kilobytes of shuffle, not a sort.
  *
  * Insert is O(k) on a Vector — for sketch-scale k (≤ a few hundred)
  * that beats tree overhead and keeps the buffer encoder trivial.
  */
class MinKPairs(k: Int)
    extends Aggregator[(String, Double), Seq[(String, Double)], Seq[(String, Double)]] {

  private def lt(a: (String, Double), b: (String, Double)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Seq[(String, Double)],
                     x: (String, Double)): Seq[(String, Double)] =
    if (x == null || x._1 == null) buf
    else if (buf.length >= k && !lt(x, buf.last)) buf // full and x ≥ last
    else {
      val (before, after) = buf.span(lt(_, x))
      (before ++ (x +: after)).take(k)
    }

  def zero: Seq[(String, Double)] = Nil
  def reduce(b: Seq[(String, Double)], a: (String, Double)): Seq[(String, Double)] =
    insert(b, a)
  def merge(b1: Seq[(String, Double)], b2: Seq[(String, Double)]): Seq[(String, Double)] =
    b2.foldLeft(b1)(insert)
  def finish(r: Seq[(String, Double)]): Seq[(String, Double)] = r

  def bufferEncoder: Encoder[Seq[(String, Double)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Double)]] = ExpressionEncoder()
}
