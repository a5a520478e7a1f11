package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One step of a CEP pattern.
  *
  * @param eventType the event type this step matches
  * @param minValue  optional per-step predicate: the event's `value`
  *                  must be >= this (null values never match)
  * @param timeoutUs step GAP timeout: while seeking (or, with
  *                  `times` > 1, extending) this step, an event whose
  *                  ts exceeds the LAST CONSUMED event's ts by more
  *                  than this resets the partial match (ignored while
  *                  nothing is consumed yet — the anchor has nothing
  *                  to time out against). For `times` = 1 this is
  *                  exactly "within X of the previous matched step";
  *                  for repeated steps it bounds EVERY consecutive
  *                  gap, including the hop from the previous step into
  *                  the first repetition. Long.MaxValue = no timeout.
  * @param times     exact repetition count (MATCH_RECOGNIZE `A{n}`):
  *                  the step consumes exactly `times` qualifying
  *                  events before the pattern advances. Exact counts
  *                  keep the automaton DETERMINISTIC — a {m,M} range
  *                  makes "continue this step or advance?" ambiguous
  *                  (greedy/reluctant), which is a semantics choice an
  *                  oracle comparison cannot paper over, so ranges are
  *                  deliberately not offered.
  * @param altTypes  alternation (MATCH_RECOGNIZE `(A|B)`): additional
  *                  event types this step also accepts, under the same
  *                  value predicate and timeout.
  */
case class CepStep(eventType: String, minValue: Option[Double] = None,
                   timeoutUs: Long = Long.MaxValue, times: Int = 1,
                   altTypes: Seq[String] = Nil) {
  require(times >= 1, s"a step needs times >= 1, got $times")
  def matchesType(tpe: String): Boolean =
    tpe == eventType || altTypes.contains(tpe)
  def allTypes: Seq[String] = eventType +: altTypes
}

/** One emitted generic pattern match: the matched step event ids in
  * step order, plus the anchor and terminal timestamps. */
case class CepGenMatch(user_id: Long, match_no: Long,
                       step_event_ids: Seq[Long],
                       start_ts_us: Long, end_ts_us: Long)

/** The automaton cursor — O(pattern) state per key, forever: the index
  * of the step being sought, the repetitions consumed of that step so
  * far, the matched anchors, and the match counter. Encodes cleanly
  * (fixed schema) so the streaming engine can carry it in a state
  * store. */
case class CepCursor(state: Int, rep: Int, anchorIds: Seq[Long],
                     anchorTs: Seq[Long], matchNo: Long)

/** Generalized complex-event-processing: MATCH_RECOGNIZE-class ordered
  * sequence detection with per-step predicates and timeouts, strict
  * first-match, and skip-past-last-row (non-overlapping matches) — the
  * contraction of Flink CEP / SQL MATCH_RECOGNIZE that a product
  * funnel, fraud rule, or attribution audit actually uses. The
  * reference's surface is the per-stream ordered event list
  * (eventStream.go:63-71); cross-event inference is north-star surface.
  *
  * ONE automaton kernel ([[Cep.step]]) is shared verbatim by:
  *   - the batch operator ([[Cep.matchesGeneric]], q138/q139),
  *   - the streaming operator ([[graft.streaming.StreamingCep]], S31),
  * so stream ≡ batch bit-for-bit under any microbatch split, and the
  * recursive-CTE oracles replay the identical integer state machine.
  *
  * Semantics, fixed deterministically (the q138 contract):
  *   - strict first-match: while seeking step k, a fresh step-0-type
  *     event does NOT re-anchor — the earliest live partial match wins;
  *   - timeout-then-reprocess: a step timeout resets to step 0 and the
  *     CURRENT event is evaluated there (a timing-out anchor's
  *     replacement can itself anchor);
  *   - skip past last: an emitted match consumes its events — the next
  *     match starts fresh after the terminal event.
  *
  * Scale shape (the q59b ordered-fold contract, Packing.scala): ONE
  * shuffle on user_id, an EXTERNAL sort within partitions (spills,
  * never OOMs — no per-group materialization, so a 10⁸-event bot user
  * streams through in O(pattern) memory), then one mapPartitions scan
  * whose cursor resets at user boundaries.
  */
object Cep {

  /** The q138 funnel as a pattern spec: view → click → purchase, each
    * non-anchor step under the shared `withinUs` timeout. */
  def funnel3(withinUs: Long): Seq[CepStep] = Seq(
    CepStep("view"),
    CepStep("click", timeoutUs = withinUs),
    CepStep("purchase", timeoutUs = withinUs))

  val initCursor: CepCursor = CepCursor(0, 0, Nil, Nil, 0L)

  private val StepRe =
    """^([A-Za-z0-9_]+(?:\s*\|\s*[A-Za-z0-9_]+)*)\s*(?:\{\s*(\d+)\s*\})?((?:\s*(?:>=|<=)\s*-?\d+(?:\.\d+)?)*)$""".r
  private val PredRe = """(>=|<=)\s*(-?\d+(?:\.\d+)?)""".r

  /** Parse a compact pattern-string spec into a [[CepStep]] sequence —
    * the SQL-literal form of bring-your-own-pattern CEP, so the
    * `graft_cep_pattern` TVF can express everything the Scala API can
    * (quantifiers, alternation, value floors, gap timeouts).
    *
    * Grammar (whitespace-insensitive inside a step):
    * {{{
    *   spec  := step (';' step)*
    *   step  := type ('|' alt)* ['{' times '}'] [ '>=' minValue ] [ '<=' gapTimeoutUs ]
    * }}}
    * `>=` is the step's value floor (double); `<=` is the step's gap
    * timeout in microseconds (integer; omitted = no timeout); `{n}` is
    * the exact repetition count; `|` lists alternation types. The two
    * predicates may appear in either order. Examples:
    * {{{
    *   "view; click <= 86400000000; purchase >= 50 <= 86400000000"
    *   "click{3} <= 1000; purchase >= 30 <= 2000"
    *   "signup; view|click{2} <= 1000; purchase <= 1000"
    * }}}
    * Malformed specs throw `IllegalArgumentException` naming the
    * offending step — never a silent empty pattern. */
  def parsePattern(spec: String): Seq[CepStep] = {
    val steps = spec.split(";", -1).map(_.trim).toSeq
    require(steps.nonEmpty && steps.forall(_.nonEmpty),
      s"CEP pattern spec has an empty step: '$spec'")
    steps.map {
      case StepRe(types, quant, preds) =>
        val ts = types.split("\\|").map(_.trim).toSeq
        require(ts.distinct.length == ts.length,
          s"duplicate type in CEP alternation '$types'")
        val times = Option(quant).map(_.toInt).getOrElse(1)
        var minV: Option[Double] = None
        var tmo: Option[Long] = None
        PredRe.findAllMatchIn(preds).foreach { m =>
          val num = m.group(2)
          m.group(1) match {
            case ">=" =>
              require(minV.isEmpty, s"duplicate '>=' value floor in CEP step '$types'")
              minV = Some(num.toDouble)
            case "<=" =>
              require(tmo.isEmpty, s"duplicate '<=' gap timeout in CEP step '$types'")
              require(!num.contains('.') && num.toLong > 0,
                s"CEP gap timeout must be a positive integer microsecond count, got '$num' in step '$types'")
              tmo = Some(num.toLong)
          }
        }
        CepStep(ts.head, minV, tmo.getOrElse(Long.MaxValue), times, ts.tail)
      case bad => throw new IllegalArgumentException(
        s"malformed CEP step '$bad' — expected \"type[|alt…][{n}] [>= minValue] [<= gapTimeoutUs]\"")
    }
  }

  /** The event `value` as a predicate-safe double: SQL null → NaN
    * (NaN >= t is false for every t, so nulls never satisfy a minValue
    * predicate), and a frame WITHOUT a value column — e.g. the
    * S31 4-column stream, whose patterns carry no value predicates —
    * folds as all-NaN rather than failing to resolve. */
  private[graft] def valueExpr(events: DataFrame) =
    if (events.columns.contains("value"))
      coalesce(col("value"), lit(Double.NaN)).as("value")
    else lit(Double.NaN).as("value")

  /** Advance the cursor by one event; returns the new cursor and the
    * match emitted, if any. Pure — the single shared batch/stream
    * kernel. `value` null-safety: callers pass NaN for SQL null, and
    * NaN >= t is false for every t, so null values never satisfy a
    * minValue predicate.
    *
    * Gap timeout first (the q138 timeout-then-reprocess rule,
    * generalized): while ANY event has been consumed, an incoming
    * event beyond the sought step's gap window of the LAST consumed
    * event resets to step 0 and the current event is evaluated there
    * (a timing-out anchor's replacement can itself anchor). Then the
    * greedy-deterministic consume: a qualifying event increments the
    * sought step's repetition count; reaching `times` advances the
    * step (or emits, on the terminal step). */
  def step(pattern: IndexedSeq[CepStep], cur: CepCursor, user: Long,
           id: Long, ts: Long, tpe: String, value: Double): (CepCursor, Option[CepGenMatch]) = {
    // Overflow-safe gap check: events fold in ts order, so the
    // difference is non-negative; `last + timeoutUs` would wrap for the
    // Long.MaxValue no-timeout sentinel and falsely reset every cursor.
    val c =
      if (cur.anchorTs.nonEmpty && ts - cur.anchorTs.last > pattern(cur.state).timeoutUs)
        cur.copy(state = 0, rep = 0, anchorIds = Nil, anchorTs = Nil)
      else cur
    val st = pattern(c.state)
    if (st.matchesType(tpe) && st.minValue.forall(value >= _)) {
      val ids = c.anchorIds :+ id
      val tss = c.anchorTs :+ ts
      if (c.rep + 1 < st.times)
        (c.copy(rep = c.rep + 1, anchorIds = ids, anchorTs = tss), None)
      else if (c.state == pattern.length - 1) {
        val n = c.matchNo + 1
        (CepCursor(0, 0, Nil, Nil, n), Some(CepGenMatch(user, n, ids, tss.head, ts)))
      } else (CepCursor(c.state + 1, 0, ids, tss, c.matchNo), None)
    } else (c, None)
  }

  /** Pattern matches over the event log as a DataFrame of
    * (user_id, match_no, step_event_ids, start_ts_us, end_ts_us,
    * duration_us). Requires columns user_id, event_id, ts_us,
    * event_type, value. */
  def matchesGeneric(events: DataFrame, pattern: Seq[CepStep]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val pat = pattern.toIndexedSeq
    require(pat.nonEmpty, "CEP pattern needs at least one step")
    val types = pat.flatMap(_.allTypes).distinct
    events
      .where(col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), valueExpr(events))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .as[(Long, Long, Long, String, Double)]
      .mapPartitions { it =>
        var user = Long.MinValue
        var started = false
        var cur = initCursor
        it.flatMap { case (u, id, ts, tpe, v) =>
          if (!started || u != user) { user = u; started = true; cur = initCursor }
          val (c2, m) = step(pat, cur, u, id, ts, tpe, v)
          cur = c2
          m
        }
      }
      .toDF()
      .withColumn("duration_us", col("end_ts_us") - col("start_ts_us"))
      .orderBy("user_id", "match_no")
  }
}
