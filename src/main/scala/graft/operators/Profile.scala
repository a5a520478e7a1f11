package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.roundTo

/** Corpus profiling — the data-quality gate of a training pipeline:
  * one pass over the table computing per-stratum integrity counters
  * (row counts, null/empty rates, length extrema and means, key
  * uniqueness) that mixture decisions and ingest alarms read.
  *
  * Single hash aggregation over a low-cardinality key: partial
  * aggregation collapses everything map-side, the shuffle moves one
  * accumulator row per (stratum, partition) — profiling 100 TB costs
  * one scan.
  */
object Profile {

  /** Q23 — per-source profile of the documents corpus. */
  def documentsProfile(docs: DataFrame): DataFrame =
    docs
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_distinct_ids"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("n_empty_text"),
        countDistinct(col("lang")).as("n_langs"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        roundTo(sum("n_chars").cast("double") / count(lit(1)), 4).as("avg_chars"),
        sum(length(col("text")).cast("long")).as("total_text_len"))
      .withColumn("ids_unique", col("n_distinct_ids") === col("n_docs"))
      .orderBy("source")
}
