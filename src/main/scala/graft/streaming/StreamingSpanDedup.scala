package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Curation

/** One chunk instance entering its digest's state group. */
case class ChunkArrival(h: String, doc_id: Long, chunk_idx: Int, c_tokens: Long)

/** Digest state: the coordinates of the first-seen instance. */
case class FirstSeen(doc_id: Long, chunk_idx: Int)

/** Keep/drop verdict for one chunk instance. */
case class ChunkKeep(doc_id: Long, chunk_idx: Int, c_tokens: Long, kept: Boolean)

/** Online span-level dedup — the streaming form of
  * [[graft.operators.Curation.spanDedup]]: an arriving chunk survives
  * iff its content digest has never been seen before (the C4 rule,
  * applied at ingest time instead of over a finished corpus).
  *
  * Keyed state per chunk digest holds ONE record — the first-seen
  * coordinates — so state size is O(distinct chunks) without expiry.
  * A production deployment MUST bound that: pass `ttl > 0` and state
  * for a digest not sighted within the TTL is evicted (processing-time
  * timeout, refreshed on every sighting — the same bound the reference
  * applies to idle streams, main.go:32-46). The contract under expiry:
  * no chunk is re-admitted while its digest has been seen within the
  * TTL horizon; a duplicate arriving after its digest idled past the
  * TTL is re-admitted as a fresh first sighting (exactness is traded
  * for bounded memory exactly the way a batch job would scope its
  * dedup window). StreamingSpec S14b pins both properties.
  *
  * Arrivals within a microbatch are sorted by (doc_id, chunk_idx)
  * before the fold, so intra-batch delivery order (which Spark does
  * not define) cannot change which instance wins; under cross-batch
  * doc-id-ordered delivery the streaming verdicts match the batch rule
  * exactly (StreamingSpec S14).
  */
object StreamingSpanDedup {

  /** Wire onto a (streaming or batch) docs frame with (doc_id, text).
    * Emits one [[ChunkKeep]] per chunk instance in append mode.
    *
    * @param ttl idle-state expiry: a digest unseen for `ttl` is dropped
    *            from state (and a later duplicate re-admitted). `null`
    *            (default) = exact/unbounded — test-scale only.
    */
  def chunkKeeps(docs: DataFrame, span: Int,
                 ttl: java.time.Duration = null): Dataset[ChunkKeep] = {
    import docs.sparkSession.implicits._
    val bounded = ttl != null && !ttl.isZero && !ttl.isNegative
    val timeoutConf =
      if (bounded) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    Curation.spanChunks(docs, span)
      .select("h", "doc_id", "chunk_idx", "c_tokens").as[ChunkArrival]
      .groupByKey(_.h)
      .flatMapGroupsWithState[FirstSeen, ChunkKeep](
        OutputMode.Append(), timeoutConf) {
        (_, rows, state: GroupState[FirstSeen]) =>
          if (state.hasTimedOut) {
            // Idle past the TTL: evict. The digest's next sighting (if
            // any) re-enters the None branch below as a fresh first.
            state.remove()
            Iterator.empty
          } else {
            val arrived = rows.toList.sortBy(r => (r.doc_id, r.chunk_idx))
            val verdicts = state.getOption match {
              case Some(_) =>
                arrived.map(r => ChunkKeep(r.doc_id, r.chunk_idx, r.c_tokens, kept = false))
              case None =>
                val first = arrived.head
                state.update(FirstSeen(first.doc_id, first.chunk_idx))
                ChunkKeep(first.doc_id, first.chunk_idx, first.c_tokens, kept = true) ::
                  arrived.tail.map(r => ChunkKeep(r.doc_id, r.chunk_idx, r.c_tokens, kept = false))
            }
            // Refresh on every sighting: the horizon is measured from the
            // LAST time the digest was seen, so hot chunks never expire.
            if (bounded) state.setTimeoutDuration(ttl.toMillis)
            verdicts.iterator
          }
      }
  }
}
