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
  * live client echoing it back, and `logHash`, the running prefix sum of
  * per-event summary-hash terms (length = log.length + 1): the log is
  * append-only and each event's term is immutable, so any delta's hash
  * is `logHash(hi) - logHash(lo)` — incremental maintenance instead of
  * re-hashing O(delta) rows per sync. Prefixes may wrap Long; the
  * difference is still exact because every true delta sum < 2^63.
  * `statesHash` likewise caches each state row's summary-hash term at
  * write time (one hash per write, not one per delivery — a row is
  * re-delivered to every other client).
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
    statesHash: Map[Long, Long],
    log: Seq[SyncEvent],
    logHash: Seq[Long],
    clientLastT: Map[String, Long],
    syncSeq: Long)

/** What one sync returns (reference: main.go:102-107): the server tick,
  * the event delta (paired with each event's global append rank — the
  * explicit total order a distributed engine needs where the reference
  * relies on Go slice order), the state delta, and the caller's proxy id.
  *
  * `deltaEvents` is a lazy O(1)-to-construct slice of the immutable log;
  * `deltaEventsHash` is the order-sensitive hash sum of that slice,
  * served from [[GameState.logHash]] prefix sums without touching the
  * rows — consumers that only need the summary (the replay/streaming
  * operators) never materialize the payload.
  */
case class SyncResponse(
    t: Long,
    proxyId: Long,
    deltaEvents: Seq[(Int, SyncEvent)],
    deltaEventsHash: Long,
    deltaStates: Seq[SyncStateRow],
    deltaStatesHash: Long)

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
  def init(now: Long, seed: Long): GameState = {
    val seedEvent = SyncEvent(1L, "_a", "_", seed.toString)
    GameState(
      t = 0L, lastSentT = 0L, stateT = 1L, lastTick = now, lastProxyId = 0L,
      clients = Map.empty, states = Map.empty, statesHash = Map.empty,
      log = Vector(seedEvent),
      logHash = Vector(0L, eventTerm(0, seedEvent)),
      clientLastT = Map.empty, syncSeq = 0L)
  }

  /** Summary-hash term of one state row, over the canonical (key-sorted)
    * serialization of the data map. DuckDB mirror: q20 oracle in
    * [[graft.SparkEntry]].
    */
  def stateTerm(s: SyncStateRow): Long =
    hash48(s"${s.origin}:${s.t}:" +
      s.data.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","))

  /** The order-sensitive summary-hash term of one logged event: the
    * global append rank is mixed in, so equal hash sums imply equal
    * ordered sequences, not just equal sets. DuckDB mirror: see the q20
    * oracle in [[graft.SparkEntry]].
    */
  def eventTerm(rank: Int, e: SyncEvent): Long =
    hash48(s"$rank:${e.t}:${e.eventType}:${e.origin}:${e.body}")

  /** Append one event, extending the hash-prefix sums in lockstep.
    * Callers must have normalized both sequences to Vector (process()
    * does) so the appends are effectively O(1).
    */
  private def append(g: GameState, e: SyncEvent): GameState =
    g.copy(
      log = g.log :+ e,
      logHash = g.logHash :+ (g.logHash.last + eventTerm(g.log.length, e)))

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

    // Normalize the log (and its hash prefixes) to Vector once:
    // state-store deserialization can hand back an ArraySeq whose :+ is
    // a full copy — O(n) per append would re-create the reference's
    // quadratic behavior in streaming.
    val gn =
      if (g0.log.isInstanceOf[Vector[_]] && g0.logHash.isInstanceOf[Vector[_]]) g0
      else g0.copy(log = g0.log.toVector, logHash = g0.logHash.toVector)

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
    // Most syncs evict nobody — an allocation-free existence probe first,
    // so the per-sync cost of the common case is one map scan, not a
    // materialized+sorted Seq (this fold runs once per sync over the
    // stream's whole life).
    if (g.clients.exists { case (_, ci) => now - ci.lastTouch > cfg.clientTimeout }) {
      val expired = g.clients.toSeq
        .filter { case (_, ci) => now - ci.lastTouch > cfg.clientTimeout }
        .sortBy(_._2.proxyId)
      expired.foreach { case (cid, ci) =>
        g = append(
          g.copy(
            clients = g.clients - cid,
            states = g.states - ci.proxyId,
            statesHash = g.statesHash - ci.proxyId),
          SyncEvent(g.lastSentT + 1, "_d", "_", ci.proxyId.toString))
      }
    }

    // 2b. Touch or create the caller (game.go:44-58,110-112): a client
    // returning after eviction gets a FRESH proxy id and a new `_c`.
    val proxyId = g.clients.get(clientId) match {
      case Some(ci) =>
        g = g.copy(clients = g.clients + (clientId -> ci.copy(lastTouch = now)))
        ci.proxyId
      case None =>
        val pid = g.lastProxyId + 1
        g = append(
          g.copy(
            lastProxyId = pid,
            clients = g.clients + (clientId -> ClientInfo(pid, now))),
          SyncEvent(g.lastSentT + 1, "_c", "_", pid.toString))
        pid
    }

    // 3. Apply events (game.go:119-125 + eventStream.go:48-54): origin
    // rewritten to the server-assigned proxy id (trust boundary), time
    // stamped LastSentT + 1 — one tick past the last delivered
    // watermark, so no client ever receives an event for a tick it has
    // already simulated; if no tick has elapsed the event is withheld by
    // the `t <= T` delta predicate until T advances.
    events.foreach { case (tpe, body) =>
      g = append(g, SyncEvent(g.lastSentT + 1, tpe, proxyId.toString, body))
    }

    // 4. Apply state (game.go:66-68 + stateStream.go:19-21): whole-map
    // replace (LWW), stamped with the state clock.
    state.foreach { data =>
      val row = SyncStateRow(g.stateT, proxyId.toString, data)
      g = g.copy(
        states = g.states + (proxyId -> row),
        statesHash = g.statesHash + (proxyId -> stateTerm(row)))
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
    // Payload: a lazy slice — rows materialize only if a consumer reads
    // them (the response body of a live server); the summary hash is a
    // prefix difference, computed without touching any row.
    val deltaEvents: IndexedSeq[(Int, SyncEvent)] =
      new scala.collection.immutable.AbstractSeq[(Int, SyncEvent)]
        with scala.collection.immutable.IndexedSeq[(Int, SyncEvent)] {
        def length: Int = hi - lo
        def apply(i: Int): (Int, SyncEvent) = { val j = lo + i; (j, logIdx(j)) }
      }
    val deltaEventsHash = g.logHash(hi) - g.logHash(lo)
    // States delta: count + hash in one allocation-free pass (the sum is
    // commutative, so no order needed); the proxy-id-ordered payload is
    // a lazy view that sorts only if a consumer actually reads the rows
    // (the wire response does; the replay/streaming summaries don't).
    var nDelivered = 0
    var deltaStatesHash = 0L
    g.states.foreach { case (pid, s) =>
      if (s.t > lastKnown && s.t <= g.stateT) {
        nDelivered += 1
        deltaStatesHash += g.statesHash(pid)
      }
    }
    val statesSnap = g.states
    val stateTSnap = g.stateT
    val nSnap = nDelivered
    val deltaStates: Seq[SyncStateRow] =
      new scala.collection.immutable.AbstractSeq[SyncStateRow]
        with scala.collection.immutable.IndexedSeq[SyncStateRow] {
        private lazy val sorted: Array[SyncStateRow] = statesSnap.iterator
          .filter { case (_, s) => s.t > lastKnown && s.t <= stateTSnap }
          .toArray.sortBy(_._1).map(_._2)
        def length: Int = nSnap
        def apply(i: Int): SyncStateRow = sorted(i)
      }

    g = g.copy(
      clientLastT = g.clientLastT + (clientId -> g.t),
      syncSeq = g.syncSeq + 1)
    (g, SyncResponse(
      g.t, proxyId, deltaEvents, deltaEventsHash, deltaStates, deltaStatesHash))
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
    *
    * Called once per delta row per sync (O(total delta volume) over a
    * replay), so it's the replay's hot loop: the digest is thread-local
    * and the first 12 hex chars are read directly off the first 6 digest
    * bytes — same value as `parseLong(hex.take(12), 16)`, no hex string.
    */
  def hash48(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
