package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.{Cep, CepGenMatch, CepStep}

/** ScalaCheck properties for the CEP kernel across the whole pattern
  * matrix (sequence × quantifiers × alternation × value predicates ×
  * gap timeouts): the kernel must equal an INDEPENDENT naive reference
  * automaton on random inputs, ignore non-pattern events, and emit
  * structurally sound matches. The fixture specs pin the named
  * semantic corners; these properties sweep the space between them.
  */
object CepPropertiesSpec extends Properties("Cep") {

  private val types = Vector("a", "b", "c", "d")

  private case class Ev(id: Long, ts: Long, tpe: String, value: Double)

  private val genEvents: Gen[List[Ev]] =
    Gen.listOfN(120, for {
      dt <- Gen.choose(1L, 40L)
      t <- Gen.oneOf(types)
      v <- Gen.choose(0, 100)
    } yield (dt, t, v.toDouble)).map { raw =>
      var ts = 0L
      raw.zipWithIndex.map { case ((dt, t, v), i) =>
        ts += dt; Ev(i.toLong, ts, t, v)
      }
    }

  private val genStep: Gen[CepStep] = for {
    tpe <- Gen.oneOf(types)
    alts <- Gen.someOf(types.filterNot(_ == tpe))
    mv <- Gen.option(Gen.choose(10, 90).map(_.toDouble))
    tmo <- Gen.oneOf(25L, 60L, 150L, Long.MaxValue)
    times <- Gen.choose(1, 3)
  } yield CepStep(tpe, mv, tmo, times, alts.toSeq)

  private val genPattern: Gen[List[CepStep]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genStep))

  /** Independent reference: a direct transcription of the DOCUMENTED
    * semantics (gap timeout → reset-and-reprocess; greedy consume;
    * exact counts; emit-and-reset on the terminal step), written as a
    * plain while-loop over mutable state — no shared code with
    * [[Cep.step]]. */
  private def reference(pattern: List[CepStep], evs: List[Ev]): List[CepGenMatch] = {
    val out = List.newBuilder[CepGenMatch]
    var state = 0
    var rep = 0
    var ids = List.empty[Long]   // reverse order
    var tss = List.empty[Long]
    var matchNo = 0L
    evs.foreach { e =>
      if (tss.nonEmpty && e.ts - tss.head > pattern(state).timeoutUs) {
        state = 0; rep = 0; ids = Nil; tss = Nil
      }
      val st = pattern(state)
      val hit = (e.tpe == st.eventType || st.altTypes.contains(e.tpe)) &&
        st.minValue.forall(m => !e.value.isNaN && e.value >= m)
      if (hit) {
        ids = e.id :: ids
        tss = e.ts :: tss
        if (rep + 1 < st.times) rep += 1
        else if (state == pattern.length - 1) {
          matchNo += 1
          out += CepGenMatch(7L, matchNo, ids.reverse, tss.last, e.ts)
          state = 0; rep = 0; ids = Nil; tss = Nil
        } else { state += 1; rep = 0 }
      }
    }
    out.result()
  }

  private def kernel(pattern: List[CepStep], evs: List[Ev]): List[CepGenMatch] = {
    val pat = pattern.toIndexedSeq
    var cur = Cep.initCursor
    val out = List.newBuilder[CepGenMatch]
    evs.foreach { e =>
      val (c2, m) = Cep.step(pat, cur, 7L, e.id, e.ts, e.tpe, e.value)
      cur = c2
      m.foreach(out += _)
    }
    out.result()
  }

  property("kernel ≡ independent reference automaton") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      kernel(pat, evs) == reference(pat, evs)
    }

  property("events outside the pattern's type set never change the matches") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val listed = pat.flatMap(s => s.eventType +: s.altTypes).toSet
      val filtered = evs.filter(e => listed.contains(e.tpe))
      kernel(pat, filtered) == kernel(pat, evs)
    }

  property("matches are sound: counts, order, non-overlap, duration") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val ms = kernel(pat, evs)
      val n = pat.map(_.times).sum
      val byId = evs.map(e => e.id -> e).toMap
      ms.zipWithIndex.forall { case (m, i) =>
        m.match_no == i + 1 &&
        m.step_event_ids.length == n &&
        m.step_event_ids == m.step_event_ids.sorted &&
        m.start_ts_us == byId(m.step_event_ids.head).ts &&
        m.end_ts_us == byId(m.step_event_ids.last).ts &&
        m.end_ts_us >= m.start_ts_us
      } &&
      // Non-overlap: each match's ids come strictly after the previous
      // match's terminal id (skip past last).
      ms.sliding(2).forall {
        case List(a, b) => b.step_event_ids.head > a.step_event_ids.last
        case _          => true
      }
    }
}
