package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.PortableHash.hash48

/** Keyed sample state: the top-(k+1) priority rows seen so far —
  * (priority, event_id, weight) triples, bounded by k forever. */
case class PriSample(rows: Seq[(Double, Long, Long)])

/** One per-key estimate row emitted after each microbatch. */
case class PriEstimate(key: String, n_sample: Long, tau_c: Long,
                       est_total_centi: Long)

/** S32 — streaming priority sampling: the q136 estimator maintained
  * ONLINE. Priority sampling's whole point at scale is that the
  * sample is MERGEABLE — the top-(k+1) priorities of a union are the
  * top-(k+1) of the per-part tops — so a keyed stream can carry one
  * bounded sample per key forever and answer "estimated total weight
  * so far" after every microbatch, with the hash-deterministic
  * priorities making stream ≡ batch-on-prefix exact (the same rows
  * win regardless of arrival batching; StreamingSpec S32 pins the
  * estimate against an independent prefix fold at every cut).
  *
  * State per key is k+1 triples — O(k), never the event count. The
  * estimate uses q136's grid rule: τ rounds to the centi grid before
  * the Σ max(w, τ) fold, so the emitted totals are exact BIGINTs.
  */
object StreamingPrioritySample {

  /** Wire onto a (streaming or batch) frame with (key, event_id,
    * value). Emits one [[PriEstimate]] per touched key per microbatch
    * in update mode; keys with ≤ k rows so far emit the exact running
    * total (τ = 0 — every weight is in the sample).
    */
  def estimates(events: DataFrame, k: Int, salt: String): Dataset[PriEstimate] = {
    require(k >= 1, s"need k >= 1, got $k")
    import events.sparkSession.implicits._
    events
      .select(col("key"), col("event_id").cast("long").as("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("w"),
        expr(
          s"(CAST(${hash48(s"concat('$salt', ':', CAST(event_id AS STRING))")} AS DOUBLE)" +
            " + 0.5) / 281474976710656.0").as("u"))
      .select(col("key"), col("event_id"), col("w"),
        (col("w") / col("u")).as("pri"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PriSample, PriEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, gs: GroupState[PriSample]) =>
          val prev = gs.getOption.map(_.rows).getOrElse(Seq.empty)
          val merged = (prev ++ rows.map(r => (r._4, r._2, r._3)))
            .sortBy(t => (-t._1, t._2))
            .take(k + 1)
          gs.update(PriSample(merged))
          val (sample, tauC) =
            if (merged.length <= k) (merged, 0L)
            else (merged.take(k), math.floor(merged.last._1 + 0.5).toLong)
          val est = sample.map(t => math.max(t._3, tauC)).sum
          Iterator.single(PriEstimate(key, sample.length.toLong, tauC, est))
      }
  }
}
