package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table registry over the driver test data
  * (`/root/testdata/sf{N}/{name}.parquet`, see TESTDATA.md).
  *
  * Every query builder goes through here so schema normalization is
  * done exactly once and identically everywhere.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which the
    * vanilla Spark reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it via
    * `spark.sql.legacy.parquet.nanosAsLong` as a Long of epoch-nanos and
    * derive:
    *   - `ts_us`: epoch-microseconds Long — the canonical cross-engine
    *     event-time column. DuckDB truncates parquet ns timestamps to its
    *     native microsecond TIMESTAMP, so `ts_us === epoch_us(ts)` there;
    *     floor-division by 1000 on the ns Long gives the identical value.
    *   - `ts`: a real TimestampType (microsecond precision) for
    *     date/window functions.
    *
    * The reference keeps event time as an int64 tick (event.go:8); an
    * integer event-time column is the faithful analogue.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // GraftSession.build sets this at session-build time (the correct
    // place); this defensive idempotent set only covers sessions built
    // elsewhere (e.g. the driver's own harness).
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** Ingest-parallelism guard for per-row-heavy operators (MinHash,
    * SimHash, cosine folds, tokenization): if the scan yields fewer
    * splits than the session's parallelism — a small corpus in one file,
    * or a few huge row groups — redistribute before burning CPU on one
    * core. On a well-partitioned large corpus (splits >= cores) this is
    * a no-op, so it adds no shuffle at scale; the repartition itself
    * moves only the raw rows, which is always cheaper than serializing
    * the downstream compute.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register all tables as temp views (for spark.sql surfaces/tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
