package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.TopKAggregator

/** The bounded-heap top-k buffer must behave like sort-then-take under
  * ANY partitioning and merge order — the property partial aggregation
  * relies on (map-side slices reduce independently, merge in shuffle
  * arrival order).
  */
object TopKAggregatorSpec extends Properties("TopKAggregator") {

  private val genRows: Gen[List[(Double, Long)]] =
    Gen.listOf(for {
      s <- Gen.chooseNum(-5.0, 5.0)
      // Duplicated scores are the interesting case for tie-breaks.
      sr = math.floor(s * 4) / 4
      id <- Gen.choose(0L, 500L)
    } yield (sr, id))

  private def reference(rows: List[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.distinct.sortBy { case (s, id) => (-s, id) }.take(k)

  property("reduce-then-merge over any split == sort-take") =
    Prop.forAll(genRows, Gen.choose(1, 8), Gen.choose(1, 5)) { (rows0, k, nSplits) =>
      val rows = rows0.distinct // ids unique per score in the engine's use
      val agg = new TopKAggregator(k)
      val splits = rows.zipWithIndex.groupBy(_._2 % nSplits).values
        .map(_.map(_._1)).toList
      val partials = splits.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      val mergedRev = partials.reverse.foldLeft(agg.zero)(agg.merge)
      merged == reference(rows, k) && mergedRev == reference(rows, k)
    }
}
