package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.roundTo

/** Skew-resilient formulations of shuffles on hot keys (north-star scale
  * surface). The reference has no joins or aggregations at all; at
  * 100 TB the engine's own relational surface must survive keys whose
  * frequency is orders of magnitude above the mean (`events.event_type`
  * has 5 values — every shuffle on it puts ~20% of the corpus in one
  * task).
  *
  * Two standard techniques, both exact (results identical to the naive
  * plan — asserted by SkewSpec):
  *   - two-stage aggregation: pre-aggregate on (hot key × fine key)
  *     first, so the final shuffle on the hot key moves one row per
  *     distinct pair, not one per event;
  *   - salted join: scatter the big side's hot keys across `nSalts`
  *     sub-keys and replicate the dimension side per salt — per-task
  *     volume drops ×nSalts at the cost of a ×nSalts dim replication
  *     (dims are bounded; facts are not).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * salting is the a-priori form that also covers aggregations and
  * broadcast-ineligible shapes.
  */
object Skew {

  /** Q31 — exact distinct users per (skewed) event type, two-stage: the
    * (event_type, user_id) pre-aggregation shuffles fine-grained pairs
    * (no hot partition), the second stage counts one row per pair.
    * Catalyst plans `count(DISTINCT ...)` this way itself (Expand +
    * two aggregates); this operator is the explicit form, plus a
    * value-sum so the query is more than a count.
    */
  def twoStageDistinct(events: DataFrame): DataFrame =
    events
      .groupBy("event_type", "user_id")
      // exactSum's integer partials re-aggregate exactly across the two
      // stages (integer sums are order-free), so the double division
      // happens once, at the end.
      .agg(
        count(lit(1)).as("n_pair"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users"),
        sum("n_pair").as("n_events"),
        round(sum("sv").cast("double") / 100.0, 2).as("sum_value"))
      .orderBy("event_type")

  /** Salted equi join of a skew-keyed fact side against a bounded
    * dimension: fact rows scatter over `nSalts` sub-keys via a
    * deterministic hash of `saltSource` (any well-distributed column —
    * results are salt-invariant, SkewSpec proves it), the dimension
    * replicates per salt, and the join key becomes (key, salt).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = dim
      .withColumn("_salt", explode(expr(s"sequence(0, ${nSalts - 1})")))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Q31b — the salted join in a checkable query: events joined to a
    * (derived, 5-row) per-type average, counting events above their
    * type's mean. The dimension is derived from the fact table so the
    * query is self-contained; in production it would be any bounded
    * dimension keyed by a hot value.
    */
  def aboveTypeMean(events: DataFrame, nSalts: Int): DataFrame = {
    val dim = events
      .groupBy("event_type")
      .agg(roundTo(
        graft.functions.Deterministic.exactSum(col("value"), 2) / count(lit(1)), 4)
        .as("type_avg"))
    saltedJoin(events, dim, "event_type", col("event_id"), nSalts)
      .where(col("value") > col("type_avg"))
      .groupBy("event_type", "type_avg")
      .agg(count(lit(1)).as("n_above"))
      .select("event_type", "type_avg", "n_above")
      .orderBy("event_type")
  }
}
