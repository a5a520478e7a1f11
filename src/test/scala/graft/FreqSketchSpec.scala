package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.FreqSketchAggregator

/** The Misra–Gries buffer must keep its two-sided contract under ANY
  * partitioning and merge order — partial aggregation reduces map-side
  * slices independently and merges in shuffle arrival order, so the
  * guarantees have to be properties of (reduce, merge), not of one
  * sequential fold.
  */
object FreqSketchSpec extends Properties("FreqSketch") {

  /** Streams with a genuinely fat head over a wide filler tail, so the
    * decrement-all path actually fires (filler alphabet ≫ capacity).
    */
  private val genStream: Gen[List[String]] = for {
    heavyReps <- Gen.choose(30, 120)
    fillers   <- Gen.listOf(Gen.choose(0, 400).map(i => s"f$i"))
  } yield new scala.util.Random(heavyReps * 7919 + fillers.size)
    .shuffle(List.fill(heavyReps)("hot") ::: fillers)

  private def foldSplits(items: List[String], nSplits: Int,
                         agg: FreqSketchAggregator): Map[String, Long] = {
    val splits = items.zipWithIndex.groupBy(_._2 % nSplits).values
      .map(_.map(_._1)).toList
    splits.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
  }

  property("superset guarantee: count > n/(cap+1) always survives splits+merges") =
    Prop.forAll(genStream, Gen.choose(4, 16), Gen.choose(1, 6)) { (items, cap, nSplits) =>
      val agg = new FreqSketchAggregator(cap)
      val summary = foldSplits(items, nSplits, agg)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toDouble / (cap + 1)
      exact.forall { case (k, c) => c <= bound || summary.contains(k) }
    }

  property("counts undercount only, by at most n/(cap+1)") =
    Prop.forAll(genStream, Gen.choose(4, 16), Gen.choose(1, 6)) { (items, cap, nSplits) =>
      val agg = new FreqSketchAggregator(cap)
      val summary = foldSplits(items, nSplits, agg)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toDouble / (cap + 1)
      summary.forall { case (k, c) =>
        val t = exact.getOrElse(k, 0L)
        c <= t && (t - c) <= bound
      } && summary.size <= cap
    }
}
