package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — classifying every document across two corpus
  * versions as added / removed / changed / unchanged, the audit step a
  * pipeline runs between crawl refreshes before re-deduplicating and
  * re-packing (only `changed`/`added` docs need reprocessing; `removed`
  * ids drive tombstones in downstream indexes).
  *
  * The reference engine has no corpus-versioning surface (it ships live
  * events — /root/reference/main.go serves only current streams); this
  * belongs to the §2D LLM-pipeline extension over `documents`.
  *
  * 100 TB shape: both sides collapse to `(doc_id, md5(text))` BEFORE
  * the join, so the shuffle carries 16-byte digests, never document
  * text, and the full-outer join is a plain co-partitioned hash join on
  * the id. Nothing is driver-side; the diff of two 100 TB snapshots
  * moves ~2×32 bytes per document.
  */
object Snapshot {

  /** Per-document diff: `(doc_id, old_hash, new_hash, status)` where
    * status ∈ added | removed | changed | unchanged. Hashes are emitted
    * so a caller can route `changed` docs without rescanning either
    * snapshot.
    */
  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    diffCore(oldDocs, newDocs).orderBy("doc_id")

  private def diffCore(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** The churn dashboard: one row per status with its count — a
    * map-side-combinable aggregation over [[diff]] (4 groups total, so
    * the final shuffle is 4 rows per task regardless of corpus size).
    */
  def diffSummary(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    diffCore(oldDocs, newDocs)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
      .orderBy("status")

  /** Deterministic synthetic snapshot pair derived from one corpus
    * table, for the oracle-checked diff: the "old" crawl is missing
    * doc_id % 10 == 3 (those appear `added`), the "new" crawl dropped
    * doc_id % 7 == 2 (`removed`) and revised the text of doc_id % 5 == 0
    * (`changed`). Both transforms are mirrored verbatim in the DuckDB
    * oracle SQL.
    */
  def syntheticOld(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 =!= 3)

  def syntheticNew(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 =!= 2)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
}
