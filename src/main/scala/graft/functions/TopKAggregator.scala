package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap grouped top-k (SURVEY.md §7.2): keep the k best
  * (score, id) pairs per group with an O(k) buffer.
  *
  * The window formulation (`row_number() over (partition by g order by
  * score desc)` then `<= k`) must sort EVERY group's full candidate set;
  * this Aggregator's partial-merge shape means each map task reduces its
  * slice to k rows before the shuffle, so the exchange moves O(groups·k)
  * rows no matter how many candidates a group has — the grouped
  * analogue of TakeOrdered. Order contract: score descending, id
  * ascending on ties (same as the oracle ORDER BY).
  *
  * The buffer is a sorted Vector, not a heap object: k is small,
  * insertion is O(k), and the buffer must round-trip through an Encoder
  * between partial and final aggregation — a Vector of pairs does that
  * for free.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
