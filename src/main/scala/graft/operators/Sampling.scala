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
}
