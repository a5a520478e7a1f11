package graft

import org.apache.spark.sql.SparkSession

/** One place that knows how to build a correctly-configured session, so
  * Verify / Bench / tests can't drift:
  *   - UTC session timezone (cross-engine date determinism);
  *   - `nanosAsLong` set up-front — `events.parquet` stores
  *     TIMESTAMP(NANOS), which the vanilla reader rejects; setting the
  *     flag at build time (not as a read-path side effect) keeps reads
  *     order-independent (see [[graft.sources.Tables.events]]);
  *   - shuffle partitions sized to the local core count, not the 200
  *     default (on a real cluster this would be ~2-3× total cores /
  *     AQE-coalesced);
  *   - AQE left on (default in Spark 4) so skew-join/coalesce kick in;
  *   - [[GraftExtensions]] installed (custom codegen'd expressions,
  *     e.g. `cosine_sim`).
  */
object GraftSession {
  def build(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    registerUdafs(s)
    s
  }

  /** SQL-surface registration for the typed aggregators (extensions
    * cover expressions; Aggregators register per session): `graft_top10
    * (score, id)` → the k-best pairs as `array<struct<_1, _2>>` with the
    * bounded-buffer partial-merge shape (O(groups·k) shuffle rows).
    */
  def registerUdafs(spark: SparkSession): Unit = {
    spark.udf.register(
      "graft_top10",
      org.apache.spark.sql.functions.udaf(new graft.functions.TopKAggregator(10)))
    // Wider buffer for shortlist generation (PQ-ADC candidates before
    // exact re-rank): still O(k) per group, still partial-merged.
    spark.udf.register(
      "graft_top50",
      org.apache.spark.sql.functions.udaf(new graft.functions.TopKAggregator(50)))
  }
}
