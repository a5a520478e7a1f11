package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** One LSH band row entering a bucket group. */
case class BandedDoc(band_sig: String, doc_id: Long, shingles: Seq[String])

/** Bucket state: the docs (id + shingles) this band signature has seen. */
case class BucketIndex(members: List[BandedDoc])

/** A confirmed near-duplicate of an earlier-ingested document. */
case class DupHit(doc_id: Long, dup_of: Long, jaccard: Double)

/** Online near-duplicate filtering — the streaming form of
  * [[graft.operators.Dedup.nearDupPairs]]: every incoming document is
  * checked against the corpus ingested BEFORE it, which is what an
  * ingest pipeline actually runs (batch near-dup answers "which pairs
  * exist"; ingest needs "is this new doc a dup of anything we kept").
  *
  * Same index shape as batch LSH: keyed state per band signature holds
  * that bucket's members (bounded by `maxBucket`, the same
  * boilerplate-cluster skew cap as batch); an arriving doc exact-
  * Jaccards against its buckets' members only — O(bucket) work per
  * band, never a corpus scan. Matching is against PRIOR microbatches
  * (docs within one batch don't pair), so results are deterministic
  * under any intra-batch ordering; a doc colliding with the same
  * earlier doc in several bands reports it once per colliding band —
  * distinct() downstream if pair-uniqueness matters.
  */
object StreamingDedup {

  def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  /** Wire onto a (streaming or batch) docs frame with (doc_id, text).
    * Emits [[DupHit]]s in append mode.
    *
    * State is O(buckets × maxBucket) without expiry — unbounded as the
    * corpus grows. A production deployment passes `ttl > 0`: a band
    * bucket with no arrival within the TTL is evicted wholesale
    * (processing-time timeout, refreshed on every arrival — the
    * [[StreamingSpanDedup]] contract, which itself mirrors the
    * reference's idle-stream GC, main.go:32-46). Under expiry the
    * dedup horizon is the TTL: a duplicate of a bucket idle past the
    * TTL re-seeds the bucket as fresh and is NOT flagged — bounded
    * memory traded for a bounded lookback, pinned by S8b.
    *
    * @param ttl idle-bucket expiry; `null` (default) = exact/unbounded.
    */
  def nearDupHits(
      docs: DataFrame,
      threshold: Double,
      maxBucket: Int = Dedup.MaxBucket,
      ttl: java.time.Duration = null): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    val bounded = ttl != null && !ttl.isZero && !ttl.isNegative
    val timeoutConf =
      if (bounded) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val banded = Dedup.bandedWithShingles(docs)
      .select("band_sig", "doc_id", "shingles").as[BandedDoc]
    banded
      .groupByKey(_.band_sig)
      .flatMapGroupsWithState[BucketIndex, DupHit](
        OutputMode.Append(), timeoutConf) {
        (_, rows, state: GroupState[BucketIndex]) =>
          if (state.hasTimedOut) {
            // Bucket idle past the TTL: evict its whole member list.
            state.remove()
            Iterator.empty
          } else {
            val existing = state.getOption.getOrElse(BucketIndex(Nil)).members
            // Sort arrivals so intra-batch iteration order (which Spark
            // does not define) cannot affect which members are retained
            // under the cap.
            val arrived = rows.toList.sortBy(_.doc_id)
            val hits = for {
              r <- arrived
              m <- existing
              j = jaccard(r.shingles, m.shingles)
              if j >= threshold
            } yield DupHit(r.doc_id, m.doc_id,
              // Deterministic.roundTo's portable formula, scalar form.
              math.floor(j * 10000.0 + 0.5) / 10000.0)
            val merged = (existing ++ arrived).take(maxBucket)
            state.update(BucketIndex(merged))
            // Refresh on every arrival: hot buckets never expire.
            if (bounded) state.setTimeoutDuration(ttl.toMillis)
            hits.iterator
          }
      }
  }
}
