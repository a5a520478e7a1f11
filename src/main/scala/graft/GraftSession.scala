package graft

import org.apache.spark.sql.SparkSession

/** One place that knows how to build a correctly-configured session, so
  * Verify / Bench / tests can't drift:
  *   - UTC session timezone (cross-engine date determinism);
  *   - parquet TIMESTAMP_NTZ inference OFF — tz-less parquet timestamps
  *     (e.g. `events.ts`) read as plain TimestampType (raw micros = UTC
  *     instant under the pinned TZ), which keeps range predicates on the
  *     raw scan column pushdown-eligible; [[graft.sources.Tables.events]]
  *     still branches on the actual read schema so sessions built
  *     elsewhere (NTZ on, or a legacy nanos-as-long Spark) work too;
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
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // The fact-lake TableCatalog: CREATE TABLE graft.ns.t … /
      // CTAS are FactStore commits (see graft.sources.GraftCatalog).
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        s"${System.getProperty("java.io.tmpdir")}/graft_catalog_warehouse")
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
