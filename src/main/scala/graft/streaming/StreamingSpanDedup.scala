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
  * coordinates — so state size is O(distinct chunks), the same
  * footprint as the batch keeper aggregation's shuffle side (a real
  * deployment bounds it with a state TTL, trading exactness for memory
  * the same way the batch job would scope its dedup window). Arrivals
  * within a microbatch are sorted by (doc_id, chunk_idx) before the
  * fold, so intra-batch delivery order (which Spark does not define)
  * cannot change which instance wins; under cross-batch doc-id-ordered
  * delivery the streaming verdicts match the batch rule exactly
  * (StreamingSpec S14).
  */
object StreamingSpanDedup {

  /** Wire onto a (streaming or batch) docs frame with (doc_id, text).
    * Emits one [[ChunkKeep]] per chunk instance in append mode.
    */
  def chunkKeeps(docs: DataFrame, span: Int): Dataset[ChunkKeep] = {
    import docs.sparkSession.implicits._
    Curation.spanChunks(docs, span)
      .select("h", "doc_id", "chunk_idx", "c_tokens").as[ChunkArrival]
      .groupByKey(_.h)
      .flatMapGroupsWithState[FirstSeen, ChunkKeep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[FirstSeen]) =>
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
          verdicts.iterator
      }
  }
}
