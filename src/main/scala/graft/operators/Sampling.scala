package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hash48

/** Deterministic stratified sampling — the data-mixing step of a
  * training pipeline: draw each source at its own rate to hit a target
  * mixture.
  *
  * The draw is hash-based, not RNG-based: keep a row iff
  * `hash48(salt:doc_id) mod 10^6 < rate(source) * 10^6`. That makes the
  * sample a pure per-row predicate — map-only, no shuffle, no sampler
  * state — and, unlike `rand()`-based sampling, reproducible across
  * re-runs, retries, partitionings, and engines (the property an
  * auditable training mixture needs; `salt` gives independent draws).
  * At 100 TB the filter runs at scan speed and composes with pushdown
  * on any other predicate.
  */
object Sampling {

  /** Q136 — priority sampling (Duffield-Lund-Thorup): a k-row sample
    * that carries an UNBIASED estimator of any weighted total — the
    * primitive that answers "what is the total purchase value of this
    * 100 TB table?" from a bounded sample with provably near-optimal
    * variance (beats Bernoulli/uniform for skewed weights, which is
    * every revenue column).
    *
    * Each row draws priority q = w/u with u a deterministic hash
    * uniform (same auditability argument as [[stratifiedSample]] —
    * re-runs, retries, and the DuckDB oracle reproduce the sample
    * bit-for-bit). The k highest-priority rows form the sample; the
    * (k+1)-th priority is the threshold τ, and Σ max(w_i, τ) over the
    * sample estimates Σ w exactly unbiasedly. τ rounds to the centi
    * grid BEFORE the fold so the estimate is a pure BIGINT sum —
    * order-free, cross-engine exact.
    *
    * Scale shape: the weight/priority projection is map-only; the
    * top-(k+1) is one TakeOrdered (O(k) per partition, never a global
    * sort); the total is one map-side-combined agg. The driver touches
    * k+1 rows — the bounded-model-export contract.
    *
    * Output: one row (k, n_events, true_total_centi, est_total_centi,
    * err_ppm) — true_total rides along because the POINT is the
    * estimator's accuracy; at production scale you would drop it and
    * keep only the estimate.
    */
  def priorityEstimate(events: DataFrame, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = events.sparkSession
    val weighted = events.select(
      col("event_id"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("w"))
      .withColumn("u", expr(
        s"(CAST(${hash48(s"concat('$salt', ':', CAST(event_id AS STRING))")} AS DOUBLE)" +
          " + 0.5) / 281474976710656.0"))
      .withColumn("pri", col("w") / col("u"))
    val top = weighted
      .orderBy(col("pri").desc, col("event_id"))
      .limit(k + 1)
      .select("event_id", "w", "pri")
      .collect() // k+1 rows — the sample itself, bounded by k
      .sortBy(r => (-r.getDouble(2), r.getLong(0)))
    require(top.length == k + 1,
      s"priority sampling needs > k rows, got ${top.length} <= $k")
    val tauC = math.floor(top.last.getDouble(2) + 0.5).toLong
    val est = top.take(k).map(r => math.max(r.getLong(1), tauC)).sum
    val totals = events.agg(
      count(lit(1)).as("n_events"),
      sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("true_total_centi"))
    totals.select(
      lit(k.toLong).as("k"), col("n_events"), col("true_total_centi"),
      lit(est).as("est_total_centi"),
      expr(s"abs($est - true_total_centi) * 1000000L div true_total_centi")
        .as("err_ppm"))
  }

  /** Sample `docs` keeping each `source` stratum at `rates(source)`
    * (or `defaultRate` when absent), deterministically under `salt`.
    */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val rateCol: Column = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (src, r)) => when(col("source") === src, lit(r)).otherwise(acc)
    }
    val bucket = expr(
      s"${hash48(s"concat('$salt', ':', CAST(doc_id AS STRING))")} % 1000000")
    docs
      .withColumn("keep_rate", rateCol)
      .where(bucket < col("keep_rate") * 1000000)
      .select("doc_id", "source", "lang", "n_chars", "keep_rate")
      .orderBy("doc_id")
  }

  /** Q63 — temperature mixture reweighting, the corpus-composition step
    * that decides each source's share of the training mix: raw share
    * `p_raw ∝ n_tokens` overfits the biggest crawl, so sources are
    * reweighted by `n_tokens^α` with α = 1/2 (temperature-2 sampling —
    * the standard low-resource upweighting), and `boost = p_temp/p_raw`
    * is the per-source over/undersampling factor to feed
    * [[stratifiedSample]].
    *
    * α is fixed at 1/2 because `sqrt` is the one power IEEE 754
    * requires correctly rounded — bit-identical in every engine —
    * whereas `pow(x, α)` tolerates a ulp of libm drift (a general-α
    * variant would have the same plan shape, only a weaker float
    * contract). Cross-group totals come from a 1-row aggregate
    * broadcast back by crossJoin (the bounded pattern, not a window
    * over the sources); per-source weights are grid-rounded before the
    * exact integer total, per the engine-wide float rule.
    *
    * Scale shape: one map-side-combinable aggregation over the corpus
    * (shuffle = one row per source per partition), then arithmetic on
    * the #sources-row result. Nothing else moves.
    */
  def temperatureMixture(docs: DataFrame): DataFrame = {
    import graft.functions.Deterministic.{exactSum, roundTo}
    val bySource = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("w", roundTo(sqrt(col("n_tokens").cast("double")), 6))
    val totals = bySource.agg(
      sum("n_tokens").as("total_tokens"),
      exactSum(col("w"), 6).as("total_w"))
    bySource.crossJoin(broadcast(totals))
      .withColumn("p_raw",
        roundTo(col("n_tokens").cast("double") / col("total_tokens"), 6))
      .withColumn("p_temp", roundTo(col("w") / col("total_w"), 6))
      .withColumn("boost", roundTo(col("p_temp") / col("p_raw"), 4))
      .select("source", "n_docs", "n_tokens", "p_raw", "p_temp", "boost")
      .orderBy("source")
  }

  /** Q63b — the epoch plan: [[temperatureMixture]] extended with a
    * training-token budget, yielding per source its planned token
    * allocation (`p_temp · budget`) and the number of passes over the
    * source that allocation implies (`epochs` > 1 ⇒ the source repeats;
    * ≪ 1 ⇒ it is subsampled) — the table a mixture designer actually
    * reads before a run. Same plan shape as the mixture (one agg + a
    * 1-row broadcast); both derived columns compose already-rounded
    * shares, per the cross-engine float rule.
    */
  def epochPlan(docs: DataFrame, tokenBudget: Long): DataFrame = {
    import graft.functions.Deterministic.roundTo
    temperatureMixture(docs)
      .withColumn("planned_tokens",
        floor(col("p_temp") * tokenBudget).cast("long"))
      .withColumn("epochs",
        roundTo(col("planned_tokens").cast("double") / col("n_tokens"), 4))
      .select("source", "n_tokens", "p_temp", "planned_tokens", "epochs")
      .orderBy("source")
  }
}
