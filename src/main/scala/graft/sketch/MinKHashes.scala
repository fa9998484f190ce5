package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k distinct-string aggregate — the KMV sketch state.
  *
  * Keeps the k smallest DISTINCT values in a sorted buffer; insert
  * dedups, so the raw stream needs no upstream `distinct()` shuffle.
  * Like [[graft.similarity.TopKByScore]] (the descending numeric
  * sibling) this participates in partial aggregation: every map task
  * ships at most k strings per group, the per-group generalization of
  * TakeOrderedAndProject — which is what makes a KMV sketch of a 100 TB
  * set a few kilobytes of shuffle instead of a sort.
  *
  * Insert is O(k) on a Vector; for sketch-scale k (≤ a few hundred)
  * that beats tree overhead and keeps the buffer encoder trivial.
  */
class MinKHashes(k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {

  private def insert(buf: Seq[String], x: String): Seq[String] =
    if (x == null) buf
    else if (buf.length >= k && buf.last <= x) buf // full and x too large (or dup of last)
    else {
      val (before, after) = buf.span(_ < x)
      if (after.headOption.contains(x)) buf // already present
      else (before ++ (x +: after)).take(k)
    }

  def zero: Seq[String] = Nil
  def reduce(b: Seq[String], a: String): Seq[String] = insert(b, a)
  def merge(b1: Seq[String], b2: Seq[String]): Seq[String] = b2.foldLeft(b1)(insert)
  def finish(r: Seq[String]): Seq[String] = r

  def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
