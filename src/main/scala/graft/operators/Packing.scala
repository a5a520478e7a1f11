package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One tokenized document headed into the packer. */
case class PackInput(doc_id: Long, shard: Long, n_tokens: Long)

/** A greedy bin assignment: `fill` = tokens in the bin after this doc. */
case class PackAssign(doc_id: Long, shard: Long, bin: Long, fill: Long)

/** Sequence packing — assembling fixed token-budget training sequences
  * from a document corpus, the step between "clean corpus" and "batches
  * a trainer can consume". Two industry-standard disciplines:
  *
  *   - [[chunkPack]] (concat-and-chunk): documents are conceptually
  *     concatenated into one token stream per shard and the stream is
  *     cut every `budget` tokens; documents may straddle sequence
  *     boundaries. Zero padding waste by construction; the output maps
  *     each document to the sequence range it lands in.
  *   - [[greedyPack]] (first-fit contiguous): documents are placed
  *     whole, in order; a document that would overflow the open bin
  *     closes it and starts the next. No document is ever split (what
  *     you want when examples must not cross attention boundaries), at
  *     the price of per-bin slack.
  *
  * Both are sharded: packing is inherently an ordered scan, and a
  * single global order would serialize the corpus through one task (the
  * un-partitioned-window anti-pattern). Real pipelines pack per
  * shard/worker, so the unit of order here is a deterministic shard
  * (`doc_id % nShards`); at 100 TB shards are the parallelism axis and
  * each shard's scan is a streaming, O(1)-state fold. The reference has
  * no packing surface (it ships events, not training batches); this is
  * part of the §2D LLM-pipeline extension on the `documents` table.
  *
  * Token counts use the engine-wide whitespace convention
  * (`size(split(text, ' '))`, [[TextAnalysis.textStats]]) so the DuckDB
  * oracle mirrors bit-for-bit; every output column is integer
  * arithmetic — no float contract needed.
  */
object Packing {

  /** Deterministic shard count — the packing parallelism axis. */
  val DefaultShards = 8

  /** Q77 — sliding-window chunking (the RAG/embedding-index dual of
    * training packing): fixed `size`-token windows at `stride`-token
    * hops, so consecutive chunks overlap by `size - stride` tokens and
    * no token is more than `stride` away from a chunk start. The last
    * window starts as soon as it reaches the end (no trailing
    * fully-contained duplicate): chunk count = 1 + ceil(max(n-size,0)
    * / stride), exact integer arithmetic in both engines.
    *
    * Scale shape: pure per-row compute → posexplode. Fan-out ≈
    * n_tokens/stride rows per doc; each output row carries token
    * COORDINATES + an md5 of the chunk text (what an embedding/dedup
    * consumer keys on), never the text itself, so the exchange after
    * this operator moves fixed-width rows.
    */
  def slidingChunks(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need stride >= 1 and size >= stride")
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n", org.apache.spark.sql.functions.size(col("words")).cast("long"))
      .withColumn("n_chunks",
        expr(s"1L + (greatest(n - ${size}L, 0L) + ${stride - 1}L) div ${stride}L"))
      .select(
        col("doc_id"), col("n"), col("words"),
        posexplode(expr(s"sequence(0, n_chunks - 1)")))
      .withColumn("tok_start", col("col") * stride)
      .withColumn("c_tokens", least(col("n") - col("tok_start"), lit(size.toLong)))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("tok_start"),
        col("c_tokens"),
        md5(concat_ws(" ",
          expr(s"slice(words, CAST(tok_start AS INT) + 1, CAST(c_tokens AS INT))"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  private[graft] def tokenized(docs: DataFrame, nShards: Int): DataFrame =
    docs.select(
      col("doc_id"),
      (col("doc_id") % nShards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  /** Q59 — concat-and-chunk packing: per shard, documents ordered by
    * doc_id form one token stream cut every `budget` tokens. Emits per
    * document its stream offset (`tok_start`), the first/last sequence
    * it touches, how many sequences it spans, and its offset within the
    * first one. The cumulative sum is a window partitioned BY SHARD —
    * shards scale out; within a shard Spark's window is a single sorted
    * scan (external sort, spill-safe).
    */
  def chunkPack(docs: DataFrame, budget: Long, nShards: Int = DefaultShards): DataFrame =
    chunkCore(docs, budget, nShards).orderBy("doc_id")

  private def chunkCore(docs: DataFrame, budget: Long, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tokenized(docs, nShards)
      .withColumn("tok_start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_first", expr(s"tok_start div ${budget}L"))
      .withColumn("seq_last", expr(s"(tok_start + n_tokens - 1) div ${budget}L"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
      .withColumn("seq_offset", col("tok_start") % budget)
      .select("doc_id", "shard", "n_tokens", "tok_start",
        "seq_first", "seq_last", "n_seqs", "seq_offset")
  }

  /** Q59d — the sequence manifest: [[chunkPack]] inverted to the view a
    * trainer consumes, one row per (shard, seq) with the contributing
    * doc count, token count, and doc-id range. Every interior sequence
    * carries exactly `budget` tokens (the zero-waste tiling property,
    * re-assertable from this output alone); only each shard's last
    * sequence may be short. Explode fan-out is bounded — a doc spanning
    * k sequences emits k rows, so total rows ≈ total_tokens/budget +
    * n_docs — and the aggregation keys on (shard, seq), map-side
    * combinable.
    */
  def sequenceManifest(docs: DataFrame, budget: Long, nShards: Int = DefaultShards): DataFrame =
    chunkCore(docs, budget, nShards)
      .withColumn("seq", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("tok_in_seq",
        least(col("tok_start") + col("n_tokens"), (col("seq") + 1) * budget)
          - greatest(col("tok_start"), col("seq") * budget))
      .groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_seq").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard", "seq")

  /** Q59b — greedy first-fit contiguous packing: per shard, in doc_id
    * order, a document joins the open bin unless it would push the fill
    * past `budget`, in which case it opens the next bin. A document
    * larger than the whole budget occupies a bin alone (fill > budget,
    * never split). Emits (doc_id, shard, bin, fill-after-placement).
    *
    * The running fill/bin state is a sequential fold, so this is the
    * one packing discipline a window function cannot express (bin
    * boundaries depend on their own history). Implementation is the
    * scale shape for ordered folds over unbounded groups:
    * `repartition(shard)` + `sortWithinPartitions` (external sort —
    * spills, never OOMs, unlike a groupByKey buffer) + one
    * `mapPartitions` streaming scan with O(1) state that resets at
    * shard boundaries. The DuckDB oracle replays the same fold as a
    * recursive CTE.
    */
  def greedyPack(docs: DataFrame, budget: Long, nShards: Int = DefaultShards): Dataset[PackAssign] = {
    val in = tokenized(docs, nShards)
    import in.sparkSession.implicits._
    in.as[PackInput]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        var shard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { d =>
          if (d.shard != shard) { shard = d.shard; bin = 0L; fill = d.n_tokens }
          else if (fill + d.n_tokens > budget) { bin += 1; fill = d.n_tokens }
          else fill += d.n_tokens
          PackAssign(d.doc_id, d.shard, bin, fill)
        }
      }
  }

  /** [[greedyPack]] as an oracle-comparable frame (deterministic order). */
  def greedyPackDf(docs: DataFrame, budget: Long, nShards: Int = DefaultShards): DataFrame =
    greedyPack(docs, budget, nShards).toDF().orderBy("doc_id")

  /** Q59c — packing utilization summary: the dashboard a pipeline
    * operator reads before committing a packed corpus to training. Per
    * shard: bins produced, docs and tokens packed, the fullest bin, and
    * `utilization` = packed tokens / (bins × budget) — the complement of
    * the padding-waste fraction the trainer pays (can exceed 1 only if
    * an oversized doc overflows its solo bin). Two map-side-combinable
    * aggregations over the fold output; the shuffle key is (shard, bin)
    * then shard — token text never moves.
    */
  def packStats(docs: DataFrame, budget: Long, nShards: Int = DefaultShards): DataFrame = {
    val bins = greedyPack(docs, budget, nShards).toDF()
      .groupBy("shard", "bin")
      .agg(max("fill").as("bin_tokens"), count(lit(1)).as("n_docs"))
    bins.groupBy("shard")
      .agg(
        count(lit(1)).as("n_bins"),
        sum("n_docs").as("n_docs"),
        sum("bin_tokens").as("total_tokens"),
        max("bin_tokens").as("max_bin_tokens"),
        graft.functions.Deterministic.roundTo(
          sum("bin_tokens").cast("double") / (count(lit(1)) * budget), 4).as("utilization"))
      .orderBy("shard")
  }
}
