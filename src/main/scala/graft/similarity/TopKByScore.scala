package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group aggregate: keeps at most k (score, id) pairs
  * ordered by (score desc, id asc) in a sorted buffer.
  *
  * Why a custom Aggregator (SURVEY §2.10 "custom TypedColumn" tier): the
  * window-rank form of per-group top-k shuffles EVERY candidate row into
  * a sorted window partition; this aggregate participates in partial
  * aggregation, so each map task ships at most k rows per group — the
  * per-group generalization of what TakeOrderedAndProject does globally.
  * At |C| candidates per query and k≪|C|, the shuffle shrinks by |C|/k.
  *
  * Input rows are (group ignored, score, id); buffer is a k-bounded
  * sorted Seq (insert is O(k) — fine for ANN-scale k).
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      val (before, after) = buf.span(better(_, x))
      (before ++ (x +: after)).take(k)
    }

  def zero: Seq[(Double, Long)] = Nil
  def reduce(b: Seq[(Double, Long)], a: (Long, Double, Long)): Seq[(Double, Long)] =
    insert(b, (a._2, a._3))
  def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
