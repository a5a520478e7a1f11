package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hash48

/** Persisted unigram language model — the train-once / serve-many
  * closure for the q49 LM quality scorer: `build` scans the reference
  * corpus once and materializes the word-frequency table + the one-row
  * token total; scoring an ARRIVING candidate batch then joins the
  * batch's tokens against the stored table instead of re-deriving the
  * model per scoring run ([[graft.operators.Pipeline.lmScoreStored]]).
  * This is how LM-based quality filtering actually deploys: the model
  * comes from a fixed reference corpus (the KenLM-on-Wikipedia
  * pattern), candidates stream through it.
  *
  * Layout under `dir`:
  *   - `vocab/` — (word, n_w) PARTITIONED BY `w_bucket = hash48(word)
  *     mod nBuckets`. Scoring joins on `word`, so bucketing is not a
  *     per-query pruning device like TextIndexStore's (every batch
  *     token needs a lookup) — it bounds file sizes and keeps the
  *     store layout consistent with the postings convention.
  *   - `stats/` — ONE row (n_total).
  *
  * At 100 TB the vocabulary is the type table (millions of rows, far
  * smaller than the corpus); the scoring join shuffles batch tokens
  * against it by word — the candidate batch, never the reference
  * corpus, is the moving side.
  */
object LmStore {

  def build(docs: DataFrame, dir: String, nBuckets: Int): Unit = {
    val words = Tables.widen(docs)
      .select(explode(split(col("text"), " ")).as("word"))
    words.groupBy("word").agg(count(lit(1)).as("n_w"))
      .withColumn("w_bucket", pmod(expr(hash48("word")), lit(nBuckets.toLong)))
      .repartition(col("w_bucket"))
      .sortWithinPartitions("word")
      .write.partitionBy("w_bucket").mode("overwrite").parquet(s"$dir/vocab")
    words.agg(count(lit(1)).as("n_total"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The stored frequency table (word, n_w). */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vocab").select(col("word"), col("n_w"))

  /** The one-row token total (n_total). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/stats")

  /** [[build]] once per (dir, nBuckets) per JVM (the store-family
    * idempotence contract).
    */
  def buildOnce(docs: DataFrame, dir: String, nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!built.contains(key)) {
      build(docs, dir, nBuckets)
      built += key
    }
  }

  private val built = scala.collection.mutable.Set.empty[(String, Int)]
}
