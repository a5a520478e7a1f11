package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Packing

/** A chunk-pack assignment emitted by the streaming packer — identical
  * shape to [[graft.operators.Packing.chunkPack]]'s output rows.
  */
case class ChunkAssign(
    doc_id: Long, shard: Long, n_tokens: Long, tok_start: Long,
    seq_first: Long, seq_last: Long, n_seqs: Long, seq_offset: Long)

/** Per-shard packer state: the token-stream offset the next doc starts
  * at. The entire state of a shard's infinite pack is one Long — this is
  * why concat-and-chunk is the streaming-friendly packing discipline.
  */
case class ShardCursor(nextStart: Long)

/** Streaming sequence packing — the online form of
  * [[graft.operators.Packing.chunkPack]]: documents arriving on an
  * ingest stream are assigned their slice of each shard's infinite
  * token stream as they arrive, so training sequences can be emitted
  * continuously instead of re-packing the corpus per snapshot.
  *
  * Contract (same as every ordered fold in this engine): per-shard
  * assignment order is doc_id order. Docs within one microbatch are
  * sorted before folding, so any intra-batch arrival order yields the
  * batch answer; across microbatches the source must deliver each
  * shard's docs in nondecreasing doc_id order (an ingest log naturally
  * does). State per shard is a single Long offset — O(#shards) total,
  * never growing with corpus size, no timeout needed.
  */
object StreamingPacking {

  /** Wire onto a (streaming or batch) docs frame with (doc_id, text).
    * Emits [[ChunkAssign]]s in append mode; row-for-row equal to batch
    * [[Packing.chunkPack]] under the ordered-delivery contract.
    */
  def chunkAssignments(
      docs: DataFrame,
      budget: Long,
      nShards: Int = Packing.DefaultShards): Dataset[ChunkAssign] = {
    import docs.sparkSession.implicits._
    Packing.tokenized(docs, nShards).as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[ShardCursor, ChunkAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, rows, state: GroupState[ShardCursor]) =>
          var cursor = state.getOption.getOrElse(ShardCursor(0L)).nextStart
          val out = rows.toList.sortBy(_._1).map { case (docId, _, nTokens) =>
            val start = cursor
            cursor += nTokens
            val seqFirst = start / budget
            val seqLast = (start + nTokens - 1) / budget
            ChunkAssign(docId, shard, nTokens, start,
              seqFirst, seqLast, seqLast - seqFirst + 1, start % budget)
          }
          state.update(ShardCursor(cursor))
          out.iterator
      }
  }
}
