package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One point of a per-type hourly count series (the
  * [[graft.operators.Temporal.hourlySeries]] row shape). */
case class SeriesPoint(event_type: String, hour: Long, x: Long)

/** Keyed detector state: the trailing ≤ `window` counts (oldest
  * first) and the last hour consumed — O(window) longs per series,
  * forever. */
case class SeriesWindow(counts: Seq[Long], lastHour: Option[Long])

/** One scored point — identical columns to the batch q123 row. */
case class AnomalyVerdict(event_type: String, hour: Long, n_events: Long,
                          win_sum: Long, win_sumsq: Long, is_anomaly: Boolean)

/** S26 — ONLINE rolling z-score anomaly detection: the streaming form
  * of [[graft.operators.Temporal.anomalyZscore]]. Series points
  * arrive per event_type in hour order (the upstream resampler's
  * contract — it emits a complete grid, so "next point" always means
  * "next hour"; a gap is a pipeline bug and is rejected loudly, not
  * scored wrongly). Keyed state is the trailing `window` counts ONLY
  * — O(window) longs per series — and each arriving point with a
  * full window of priors is scored with the batch operator's exact
  * integer inequality, so stream and batch verdicts are bit-identical
  * under ANY microbatch split (StreamingSpec S26 pins this).
  *
  * Intra-batch arrivals are sorted by hour so Spark's undefined
  * group-iteration order cannot reorder the fold (the
  * [[StreamingDedup]] determinism move); cross-batch order is the
  * delivery contract above.
  */
object StreamingAnomaly {

  /** Wire onto a (streaming or batch) frame with (event_type, hour,
    * x). Emits scored points in update mode.
    */
  def verdicts(points: DataFrame, window: Int, z: Int): Dataset[AnomalyVerdict] = {
    require(window >= 2 && z >= 1, s"need window >= 2 and z >= 1, got ($window, $z)")
    import points.sparkSession.implicits._
    val zsq = z.toLong * z
    points
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("x").cast("long").as("x"))
      .as[SeriesPoint]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SeriesWindow, AnomalyVerdict](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[SeriesWindow]) =>
          val st = state.getOption.getOrElse(SeriesWindow(Vector.empty, None))
          var buf = st.counts.toVector
          var last = st.lastHour
          val out = Vector.newBuilder[AnomalyVerdict]
          rows.toVector.sortBy(_.hour).foreach { p =>
            last.foreach { h =>
              require(p.hour == h + 1,
                s"series gap for '$key': expected hour ${h + 1}, got ${p.hour} — " +
                  "the upstream resampler must emit a complete grid")
            }
            if (buf.length == window) {
              val s = buf.sum
              val ss = buf.map(c => c * c).sum
              val dev = p.x * window - s
              out += AnomalyVerdict(key, p.hour, p.x, s, ss,
                dev * dev > zsq * (window * ss - s * s))
            }
            buf = (buf :+ p.x).takeRight(window)
            last = Some(p.hour)
          }
          state.update(SeriesWindow(buf, last))
          out.result().iterator
      }
  }
}
