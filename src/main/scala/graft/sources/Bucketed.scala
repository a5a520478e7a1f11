package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the storage-level answer to repeated join /
  * aggregation shuffles on the same key (SURVEY.md §2B "Distribution";
  * the 100 TB co-location technique the Q4 scaladoc points at).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key pre-shuffles the data ONCE at write time: every later join
  * or aggregation on that key reads co-located buckets and plans with
  * no Exchange at all (asserted by BucketedJoinSpec). At 100 TB this
  * converts the dominant per-query cost (shuffling a fact table) into a
  * one-time layout decision — exactly how a lakehouse lays out its
  * biggest tables.
  */
object Bucketed {

  /** Write `df` as a managed bucketed table: `nBuckets` hash buckets on
    * `key`, rows sorted by `key` within each bucket (so joins are
    * merge-ready without an extra sort where one file per bucket
    * exists).
    */
  def writeBucketed(df: DataFrame, name: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
}
