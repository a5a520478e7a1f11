package graft.streaming

/** One event in a stream's append-only log (reference: model/event.go:7-12).
  * `t` is the logical tick at which the event occurs — stamped by the
  * server at append time, never by the client.
  */
case class SyncEvent(t: Long, eventType: String, origin: String, body: String)

/** One client's latest full-replacement state snapshot
  * (reference: model/state.go:7-11).
  */
case class SyncStateRow(t: Long, origin: String, data: Map[String, String])

/** Session record: public ("proxy") id + last-seen time
  * (reference: model/game.go:19-23).
  */
case class ClientInfo(proxyId: Long, lastTouch: Long)

/** The whole per-stream state — the reference's `Game` struct
  * (model/game.go:25-32) plus `clientLastT`, which records each client's
  * last delivered watermark so replays can thread `lastKnownT` without a
  * live client echoing it back.
  *
  * Note the two clocks: `t` (event stream, starts 0 —
  * model/eventStream.go:27) and `stateT` (state stream, starts 1 —
  * model/stateStream.go:13); both advance together on every tick.
  */
case class GameState(
    t: Long,
    lastSentT: Long,
    stateT: Long,
    lastTick: Long,
    lastProxyId: Long,
    clients: Map[String, ClientInfo],
    states: Map[Long, SyncStateRow],
    log: Seq[SyncEvent],
    clientLastT: Map[String, Long],
    syncSeq: Long)

/** What one sync returns (reference: main.go:102-107): the server tick,
  * the event delta (paired with each event's global append rank — the
  * explicit total order a distributed engine needs where the reference
  * relies on Go slice order), the state delta, and the caller's proxy id.
  */
case class SyncResponse(
    t: Long,
    proxyId: Long,
    deltaEvents: Seq[(Int, SyncEvent)],
    deltaStates: Seq[SyncStateRow])

/** Tick quantization + timeout constants (reference: model/game.go:10-17),
  * parameterized because the test corpus lives on an hours-scale clock.
  */
case class SyncConfig(tickUnit: Long, clientTimeout: Long)

/** The reference's whole `Game.Process` transaction (model/game.go:60-74)
  * as a pure state transition: (state, request) => (state', response).
  *
  * Pure and shared on purpose: the batch replay operator folds it over a
  * sync schedule (graft.operators.SyncReplay), the Structured Streaming
  * engine calls it from `flatMapGroupsWithState` (graft.streaming
  * .SyncEngine) — so "streaming ≡ batch replay" (the reference's core
  * determinism invariant, README.md:9) is structural, and is additionally
  * asserted by test S3.
  *
  * Where the reference is nondeterministic (Go map iteration order for
  * evictions, game.go:96-99, and state deltas, stateStream.go:29-34) this
  * engine imposes proxy-id order — a distributed engine must pick a
  * total order, and this one is stable under any partitioning.
  */
object SyncCore {

  /** Fresh stream state (reference: NewGame game.go:34-42 +
    * Restart eventStream.go:34-42): the `_a` reset/seed event is stamped
    * `LastSentT + 1 = 1`, so it becomes visible at the first tick. The
    * RNG seed is a parameter, not process-global `rand` — operators must
    * be re-runnable (SURVEY.md §2A #9).
    */
  def init(now: Long, seed: Long): GameState =
    GameState(
      t = 0L, lastSentT = 0L, stateT = 1L, lastTick = now, lastProxyId = 0L,
      clients = Map.empty, states = Map.empty,
      log = Vector(SyncEvent(1L, "_a", "_", seed.toString)),
      clientLastT = Map.empty, syncSeq = 0L)

  /** One sync (reference: game.Process, game.go:60-74). Steps in exact
    * reference order: tick → evictions → touch/create → apply events →
    * apply state → MarkSent → deltas.
    *
    * `lastKnownT = None` means "use the watermark recorded at this
    * client's previous sync" (what a live client would echo back).
    */
  def process(
      cfg: SyncConfig,
      g0: GameState,
      now: Long,
      clientId: String,
      lastKnownT: Option[Long],
      events: Seq[(String, String)],
      state: Option[Map[String, String]]): (GameState, SyncResponse) = {

    val lastKnown = lastKnownT.getOrElse(g0.clientLastT.getOrElse(clientId, 0L))

    // Normalize the log to Vector once: state-store deserialization can
    // hand back an ArraySeq whose :+ is a full copy — O(n) per append
    // would re-create the reference's quadratic behavior in streaming.
    val gn = if (g0.log.isInstanceOf[Vector[_]]) g0 else g0.copy(log = g0.log.toVector)

    // 1. Tick (game.go:81-90): strictly-greater threshold, floor count,
    // remainder carried by re-aligning lastTick to the tick grid.
    val elapsed = now - gn.lastTick
    var g =
      if (elapsed > cfg.tickUnit) {
        val count = elapsed / cfg.tickUnit
        gn.copy(
          t = gn.t + count,
          stateT = gn.stateT + count,
          lastTick = now - elapsed % cfg.tickUnit)
      } else gn

    // 2a. Evict timed-out sessions (game.go:94-107): emit `_d`, drop the
    // session and its state. Deterministic eviction order: proxy id asc.
    val expired = g.clients.toSeq
      .filter { case (_, ci) => now - ci.lastTouch > cfg.clientTimeout }
      .sortBy(_._2.proxyId)
    expired.foreach { case (cid, ci) =>
      g = g.copy(
        clients = g.clients - cid,
        states = g.states - ci.proxyId,
        log = g.log :+ SyncEvent(g.lastSentT + 1, "_d", "_", ci.proxyId.toString))
    }

    // 2b. Touch or create the caller (game.go:44-58,110-112): a client
    // returning after eviction gets a FRESH proxy id and a new `_c`.
    val proxyId = g.clients.get(clientId) match {
      case Some(ci) =>
        g = g.copy(clients = g.clients + (clientId -> ci.copy(lastTouch = now)))
        ci.proxyId
      case None =>
        val pid = g.lastProxyId + 1
        g = g.copy(
          lastProxyId = pid,
          clients = g.clients + (clientId -> ClientInfo(pid, now)),
          log = g.log :+ SyncEvent(g.lastSentT + 1, "_c", "_", pid.toString))
        pid
    }

    // 3. Apply events (game.go:119-125 + eventStream.go:48-54): origin
    // rewritten to the server-assigned proxy id (trust boundary), time
    // stamped LastSentT + 1 — one tick past the last delivered
    // watermark, so no client ever receives an event for a tick it has
    // already simulated; if no tick has elapsed the event is withheld by
    // the `t <= T` delta predicate until T advances.
    if (events.nonEmpty)
      g = g.copy(log = g.log ++ events.map { case (tpe, body) =>
        SyncEvent(g.lastSentT + 1, tpe, proxyId.toString, body)
      })

    // 4. Apply state (game.go:66-68 + stateStream.go:19-21): whole-map
    // replace (LWW), stamped with the state clock.
    state.foreach { data =>
      g = g.copy(states =
        g.states + (proxyId -> SyncStateRow(g.stateT, proxyId.toString, data)))
    }

    // 5. Commit the delivery watermark (eventStream.go:73-75) — AFTER
    // applyEvents, so just-appended events are delivered in THIS
    // response iff a tick has elapsed since the previous sync.
    g = g.copy(lastSentT = g.t)

    // 6. Delta scans (eventStream.go:63-71, stateStream.go:27-35):
    // events in (lastKnown, T] in append order; states with
    // lastKnown < t <= stateT, proxy-id order.
    //
    // The reference scans the whole log per sync (O(total log) — its
    // known pathology, SURVEY.md §2A). Here stamps are non-decreasing
    // in append order (stamp = LastSentT+1 and LastSentT never
    // decreases), so the delta is one contiguous slice: two binary
    // searches + O(delta) — the difference between O(n²) and O(n log n)
    // over a stream's life.
    val logIdx = g.log match {
      case v: scala.collection.immutable.IndexedSeq[SyncEvent] => v
      case other => other.toIndexedSeq
    }
    val lo = lowerBound(logIdx, lastKnown) // first idx with t > lastKnown
    val hi = lowerBound(logIdx, g.t) // first idx with t > T
    val deltaEvents = (lo until hi).map(i => (i, logIdx(i)))
    val deltaStates = g.states.valuesIterator
      .filter(s => s.t > lastKnown && s.t <= g.stateT)
      .toVector.sortBy(_.origin.toLong)

    g = g.copy(
      clientLastT = g.clientLastT + (clientId -> g.t),
      syncSeq = g.syncSeq + 1)
    (g, SyncResponse(g.t, proxyId, deltaEvents, deltaStates))
  }

  /** First index whose stamp exceeds `t` (stamps are non-decreasing). */
  private def lowerBound(log: collection.IndexedSeq[SyncEvent], t: Long): Int = {
    var lo = 0
    var hi = log.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (log(mid).t <= t) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Stream-expiry predicate (game.go:76-78 / main.go:32-46). */
  def isExpired(cfg: SyncConfig, g: GameState, now: Long, gameTimeout: Long): Boolean =
    now - g.lastTick > gameTimeout

  /** 48-bit MD5-prefix hash — Scala twin of
    * [[graft.functions.PortableHash]] (same value as the Spark SQL and
    * DuckDB formulas), used to fold delta payloads into oracle-checkable
    * summary hashes.
    */
  def hash48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }
}
