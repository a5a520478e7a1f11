package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

/** Unit suite for the pure `Process` transition (SURVEY.md §5.1):
  * delta-scan boundary conditions, stamp-after-watermark, LWW
  * replace-not-merge, timeout-before-touch ordering, tick remainder
  * carry — each anchored to the reference line it reproduces.
  */
class SyncCoreSpec extends AnyFunSuite {

  // Reference-scale config: 50 ms tick, 10 s client timeout
  // (model/game.go:10-17), in abstract time units.
  private val cfg = SyncConfig(tickUnit = 50L, clientTimeout = 10000L)

  private def sync(
      g: GameState, now: Long, client: String,
      lastKnown: Option[Long] = None,
      events: Seq[(String, String)] = Nil,
      state: Option[Map[String, String]] = None): (GameState, SyncResponse) =
    SyncCore.process(cfg, g, now, client, lastKnown, events, state)

  test("init seeds the _a event stamped t=1, withheld until the first tick") {
    val g = SyncCore.init(1000L, seed = 7L)
    assert(g.log == Vector(SyncEvent(1L, "_a", "_", "7")))
    assert(g.t == 0L && g.stateT == 1L && g.lastSentT == 0L)
    // Sync before any tick: _a (t=1) must NOT be delivered (t > T).
    val (_, r) = sync(g, 1000L, "c1")
    assert(r.t == 0L && r.deltaEvents.isEmpty)
  }

  test("tick quantization with remainder carry (game.go:81-90)") {
    var g = SyncCore.init(1000L, 0L)
    // elapsed 51 > 50 → one tick, remainder 1 carried (lastTick → 1050).
    g = sync(g, 1051L, "c1")._1
    assert(g.t == 1L && g.lastTick == 1050L)
    // elapsed 49 → below threshold, no tick.
    g = sync(g, 1099L, "c1")._1
    assert(g.t == 1L && g.lastTick == 1050L)
    // elapsed 51 → one tick; carried remainder means T tracks the grid.
    g = sync(g, 1101L, "c1")._1
    assert(g.t == 2L && g.lastTick == 1100L)
    // strict inequality: elapsed == exactly one tick unit does NOT tick.
    g = sync(g, 1150L, "c1")._1
    assert(g.t == 2L && g.lastTick == 1100L)
    // the skipped tick is made up on the next crossing.
    g = sync(g, 1201L, "c1")._1
    assert(g.t == 4L && g.lastTick == 1200L)
  }

  test("delta boundaries: t == lastKnown excluded, t == T included, t > T withheld (eventStream.go:66)") {
    var g = SyncCore.init(0L, 0L)
    g = sync(g, 0L, "c1", events = Seq(("e", "a")))._1 // stamped 1
    g = sync(g, 51L, "c1", events = Seq(("e", "b")))._1 // T=1, stamped 1; MarkSent→1
    g = sync(g, 102L, "c1", events = Seq(("e", "c")))._1 // T=2, stamped 2
    // Log now: _a(1), _c(1), a(1), b(1), c(2); T=2.
    val (_, all) = sync(g, 103L, "probe", lastKnown = Some(0L))
    // probe's _c is stamped lastSentT+1 = 3 > T=2 → withheld; everything else visible.
    assert(all.deltaEvents.map(_._2.body) == Seq("0", "1", "a", "b", "c"))
    // t == lastKnown excluded: lastKnown=1 must drop ALL t=1 events.
    val (_, part) = sync(g, 103L, "probe2", lastKnown = Some(1L))
    assert(part.deltaEvents.map(_._2.t).forall(_ == 2L))
    assert(part.deltaEvents.map(_._2.body) == Seq("c"))
    // t == T included: lastKnown = T-1 delivers exactly the t == T slice.
    val (_, top) = sync(g, 103L, "probe3", lastKnown = Some(all.t - 1))
    assert(top.deltaEvents.nonEmpty && top.deltaEvents.map(_._2.t).forall(_ == all.t))
  }

  test("stamp-after-watermark: events stamped LastSentT+1, withheld until a tick elapses (eventStream.go:48-54)") {
    var g = SyncCore.init(0L, 0L)
    val (g1, r1) = sync(g, 0L, "c1", events = Seq(("e", "x")))
    g = g1
    // No tick elapsed: the just-posted event (stamped 1 > T=0) is withheld.
    assert(r1.t == 0L && r1.deltaEvents.isEmpty)
    // After one tick it arrives, exactly once.
    val (_, r2) = sync(g, 51L, "c1")
    assert(r2.t == 1L && r2.deltaEvents.map(_._2.body).contains("x"))
  }

  test("LWW state replace, not merge (stateStream.go:19-21)") {
    var g = SyncCore.init(0L, 0L)
    g = sync(g, 0L, "c1", state = Some(Map("a" -> "1", "b" -> "2")))._1
    g = sync(g, 51L, "c1", state = Some(Map("a" -> "9")))._1
    val st = g.states.values.head
    assert(st.data == Map("a" -> "9")) // whole-map replace: "b" gone
    assert(st.t == 2L) // stamped with the state clock (starts at 1, +1 tick)
  }

  test("timeout-before-touch: returning client is evicted then re-admitted under a NEW proxy id (game.go:94-112)") {
    var g = SyncCore.init(0L, 0L)
    g = sync(g, 0L, "c1", state = Some(Map("k" -> "v")))._1 // proxy 1
    g = sync(g, 60L, "c2")._1 // proxy 2
    // c1 idle > 10s; its own return triggers eviction first, then re-admission.
    val (g2, r) = sync(g, 20000L, "c1", lastKnown = Some(0L))
    assert(r.proxyId == 3L) // fresh id, not 1
    val types = g2.log.map(e => (e.eventType, e.body))
    // _d for proxy 1 precedes the new _c for proxy 3.
    assert(types.indexOf(("_d", "1")) >= 0)
    assert(types.indexOf(("_d", "1")) < types.indexOf(("_c", "3")))
    // evicted client's state was dropped (stateStream.go:37-39).
    assert(!g2.states.contains(1L))
  }

  test("eviction order is deterministic: proxy-id ascending") {
    var g = SyncCore.init(0L, 0L)
    g = sync(g, 0L, "b")._1 // proxy 1
    g = sync(g, 10L, "a")._1 // proxy 2
    g = sync(g, 20L, "c")._1 // proxy 3
    val (g2, _) = sync(g, 30000L, "d")
    val ds = g2.log.filter(_.eventType == "_d").map(_.body)
    assert(ds == Seq("1", "2", "3"))
  }

  test("determinism: same schedule twice gives identical states and responses") {
    def run(): (GameState, Vector[SyncResponse]) = {
      var g = SyncCore.init(0L, 42L)
      val rs = Vector.newBuilder[SyncResponse]
      for (i <- 1 to 50) {
        val (g2, r) = sync(g, i * 37L, s"c${i % 3}",
          events = Seq(("e", i.toString)), state = Some(Map("i" -> i.toString)))
        g = g2; rs += r
      }
      (g, rs.result())
    }
    val (ga, ra) = run(); val (gb, rb) = run()
    assert(ga == gb && ra == rb)
  }
}
