package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed CUSUM state: the running prefix sum of deviations, its
  * running minimum, and the last hour consumed — three longs per
  * series, forever. */
case class CusumState(cum: Long, minCum: Long, lastHour: Option[Long])

/** One scored point — identical columns to the batch q135 row. */
case class CusumVerdict(event_type: String, hour: Long, x: Long,
                        cusum_c: Long, alarm: Boolean)

/** S29 — ONLINE CUSUM drift detection: the streaming form of
  * [[graft.operators.Temporal.cusumChangePoints]], served with a
  * PINNED reference level (the deployed-model shape — a live detector
  * scores against the μ it was commissioned with; re-deriving μ from
  * the drifting stream itself would hide exactly the shift it is
  * supposed to catch).
  *
  * State per series is O(1) — the prefix sum and its running minimum
  * (the reflection closed form needs nothing else) — so the detector
  * runs forever on any number of series. Points arrive per type in
  * hour order (the S26 resampler contract; a gap is rejected loudly),
  * intra-batch arrivals are sorted, and every emitted verdict uses the
  * identical integer arithmetic as the batch closed form ⇒ stream ≡
  * batch bit-for-bit under ANY microbatch split (StreamingSpec S29).
  */
object StreamingCusum {

  /** Wire onto a (streaming or batch) frame of (event_type, hour, x)
    * points. `muC` is the pinned per-type reference level in
    * centi-counts (from [[graft.operators.Temporal.seriesMu]] on the
    * commissioning window). Emits scored points in update mode.
    */
  def verdicts(
      points: DataFrame, muC: Map[String, Long],
      slackDiv: Long, thresholdMult: Long): Dataset[CusumVerdict] = {
    require(slackDiv > 0 && thresholdMult > 0,
      s"need slackDiv > 0 and thresholdMult > 0, got ($slackDiv, $thresholdMult)")
    import points.sparkSession.implicits._
    points
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("x").cast("long").as("x"))
      .as[SeriesPoint]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumVerdict](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[CusumState]) =>
          val mu = muC.getOrElse(key,
            throw new IllegalArgumentException(
              s"no pinned reference level for series '$key'"))
          val slack = mu / slackDiv
          val threshold = mu * thresholdMult
          var st = state.getOption.getOrElse(CusumState(0L, 0L, None))
          val out = Vector.newBuilder[CusumVerdict]
          rows.toVector.sortBy(_.hour).foreach { p =>
            st.lastHour.foreach { h =>
              require(p.hour == h + 1,
                s"series gap for '$key': expected hour ${h + 1}, got ${p.hour} — " +
                  "the upstream resampler must emit a complete grid")
            }
            val cum = st.cum + (100L * p.x - mu - slack)
            val minCum = math.min(st.minCum, cum)
            val cusum = cum - math.min(0L, minCum)
            out += CusumVerdict(key, p.hour, p.x, cusum, cusum > threshold)
            st = CusumState(cum, minCum, Some(p.hour))
          }
          state.update(st)
          out.result().iterator
      }
  }
}
