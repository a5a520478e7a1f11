package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming._

/** ScalaCheck properties for the determinism invariant (SURVEY.md §5.3,
  * reference README.md:9): incremental delta syncs must compose to
  * exactly one full replay — no event delivered twice, none skipped.
  */
object SyncPropertiesSpec extends Properties("SyncCore") {

  // Long timeout: eviction timing depends on *which* syncs occur, so the
  // partition property is stated on eviction-free schedules (eviction
  // ordering itself is covered by SyncCoreSpec).
  private val cfg = SyncConfig(tickUnit = 50L, clientTimeout = Long.MaxValue / 4)

  private case class Step(dt: Long, client: String, body: String)

  private val genSteps: Gen[List[Step]] =
    Gen.listOfN(60, for {
      dt <- Gen.choose(1L, 200L)
      c <- Gen.oneOf("1", "2", "3")
      b <- Gen.choose(0, 1 << 20)
    } yield Step(dt, c, b.toString))

  /** Run the base schedule; `obsSyncAt` = step indices after which the
    * observer "obs" also syncs (lastKnown threaded by the engine).
    * Returns the observer's concatenated delta-event ranks, in order.
    */
  private def run(steps: List[Step], obsSyncAt: Set[Int]): Vector[Int] = {
    var g = SyncCore.init(0L, 9L)
    var now = 0L
    val got = Vector.newBuilder[Int]
    // Observer connects first so its _c timing is identical across runs.
    val (g0, r0) = SyncCore.process(cfg, g, now, "obs", None, Nil, None)
    g = g0; got ++= r0.deltaEvents.map(_._1)
    steps.zipWithIndex.foreach { case (s, i) =>
      now += s.dt
      g = SyncCore.process(cfg, g, now, s.client, None, Seq(("e", s.body)), None)._1
      if (obsSyncAt.contains(i)) {
        val (g2, r) = SyncCore.process(cfg, g, now, "obs", None, Nil, None)
        g = g2; got ++= r.deltaEvents.map(_._1)
      }
    }
    got.result()
  }

  property("incremental deltas == one full replay (partition property)") =
    Prop.forAll(genSteps, Gen.choose(1, 7)) { (steps, stride) =>
      val last = steps.size - 1
      val frequent = run(steps, (0 to last by stride).toSet + last)
      val oneShot = run(steps, Set(last))
      frequent == oneShot
    }

  property("no delta rank delivered twice to the same client") =
    Prop.forAll(genSteps) { steps =>
      val ranks = run(steps, steps.indices.toSet)
      ranks.distinct == ranks
    }

  property("proxy ids are dense, in first-sync order") =
    Prop.forAll(genSteps) { steps =>
      var g = SyncCore.init(0L, 0L)
      var now = 0L
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      steps.foreach { s =>
        now += s.dt
        val (g2, r) = SyncCore.process(cfg, g, now, s.client, None, Nil, None)
        g = g2
        seen.getOrElseUpdate(s.client, r.proxyId)
      }
      seen.values.toSeq == (1L to seen.size.toLong)
    }

  property("T is monotonic and equals the tick-grid closed form") =
    Prop.forAll(genSteps) { steps =>
      var g = SyncCore.init(0L, 0L)
      var now = 0L
      var prevT = 0L
      var ok = true
      steps.foreach { s =>
        now += s.dt
        val (g2, r) = SyncCore.process(cfg, g, now, s.client, None, Nil, None)
        g = g2
        ok = ok && r.t >= prevT && g.lastTick % cfg.tickUnit == 0 &&
          g.lastTick == cfg.tickUnit * g.t
        prevT = r.t
      }
      ok
    }
}
