package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a mergeable Aggregator: a
  * capacity-bounded counter map whose partial-merge shape gives each map
  * task an O(capacity) buffer no matter how many distinct items its
  * slice holds — the frequency analogue of [[TopKAggregator]].
  *
  * Contract (the classic MG bound, preserved under merge per the
  * mergeable-summaries reduction): after absorbing n items, every stored
  * count undercounts its item by at most n/(capacity+1), and every item
  * with true frequency > n/(capacity+1) is present in the summary. The
  * summary is therefore a guaranteed SUPERSET of the items above any
  * share threshold 1/d with d ≤ capacity+1 — callers make the final
  * answer exact with a second counting pass over just those ≤ capacity
  * candidates (see `TextAnalysis.heavyHitters`).
  *
  * Decrement-all fires only when the buffer is full AND the item is
  * absent; each firing retires capacity+1 units of accumulated count, so
  * total decrement work is O(n) amortized. The buffer is an immutable
  * Map because it must round-trip through an Encoder between partial and
  * final aggregation.
  */
class FreqSketchAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c)                      => buf.updated(x, c + 1)
      case None if buf.size < capacity  => buf.updated(x, 1L)
      case None =>
        buf.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  /** Mergeable-summaries combine: sum counts, then if over capacity
    * subtract the (capacity+1)-th largest count from all and drop the
    * non-positive — the same error accounting as reduce's decrement, so
    * the n/(capacity+1) bound holds for the union stream.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    if (combined.size <= capacity) combined
    else {
      val cut = combined.values.toArray.sortWith(_ > _)(capacity)
      combined.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
