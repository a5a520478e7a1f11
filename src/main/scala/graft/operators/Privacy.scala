package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-gated aggregate release (north-star addition; the reference
  * — main.go:109-115 — serializes raw per-client state with no
  * aggregate surface at all, so any release policy is new surface).
  *
  * The operator is the k-anonymity release gate every analytics
  * export pipeline needs: an aggregate cell may be published only if
  * at least `k` DISTINCT users contribute to it; failing cells
  * generalize up a fixed time hierarchy (hour → day) and whatever
  * still fails is suppressed outright — including the residual
  * roll-up itself, which is withheld unless it clears `k` too (a
  * "suppressed" row naming 3 users would be the leak the gate
  * exists to prevent).
  */
object Privacy {

  private val HourUs = 3600L * 1000000L
  private val DayUs = 86400L * 1000000L

  /** Q124 — k-anonymous aggregate release over the (event_type, hour)
    * cells of the event log, generalizing along hour → day →
    * per-type residual. Exactly one release decision per event: an
    * event's counts surface at the FINEST level whose cell clears
    * `k` distinct users, or not at all. Output one row per released
    * cell: (event_type, level ∈ {hour, day, suppressed}, bucket =
    * the hour/day index or −1, n_users, n_events) — all exact
    * integers.
    *
    * Scale shape: three hash aggregations (hour cells, failing
    * events re-keyed by day, residual per type), each map-side
    * combined on bounded key spaces; the only event-sized exchanges
    * are the two left-semi joins against the (bounded) failing-cell
    * lists, which broadcast. No window, no collect; distinct-user
    * counts are exact per cell (at 100 TB swap countDistinct for the
    * q52 HLL sketch per cell if ±2% suffices — the gate itself is
    * unchanged).
    */
  def kAnonRelease(events: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    val e = events.select(col("event_type"), col("user_id"),
      expr(s"ts_us DIV ${HourUs}L").as("hour"),
      expr(s"ts_us DIV ${DayUs}L").as("day"))
    val hourly = e.groupBy("event_type", "hour")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
    val okHour = hourly.filter(col("n_users") >= k)
    val failHours = hourly.filter(col("n_users") < k).select("event_type", "hour")
    val failEvents = e.join(broadcast(failHours), Seq("event_type", "hour"), "left_semi")
    val daily = failEvents.groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
    val okDay = daily.filter(col("n_users") >= k)
    val failDays = daily.filter(col("n_users") < k).select("event_type", "day")
    val residual = failEvents
      .join(broadcast(failDays), Seq("event_type", "day"), "left_semi")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .filter(col("n_users") >= k)
    okHour.select(col("event_type"), lit("hour").as("level"),
        col("hour").as("bucket"), col("n_users"), col("n_events"))
      .unionByName(okDay.select(col("event_type"), lit("day").as("level"),
        col("day").as("bucket"), col("n_users"), col("n_events")))
      .unionByName(residual.select(col("event_type"),
        lit("suppressed").as("level"), lit(-1L).as("bucket"),
        col("n_users"), col("n_events")))
      .orderBy("event_type", "level", "bucket")
  }

  /** Q129 — differentially-private count release with DETERMINISTIC
    * Laplace noise: per-(event_type, day) event counts perturbed by
    * the Laplace(b = 1/ε) inverse CDF evaluated on a portable-hash
    * uniform, u = (hash48('dp:'‖cell) + 0.5) / 2⁴⁸ ∈ (0, 1):
    *
    *   noise = −b · sign(u − ½) · ln(1 − 2·|u − ½|)
    *
    * Seeding noise from the cell key (not a PRNG stream) makes
    * re-runs release byte-identical numbers and lets any engine —
    * here DuckDB — restate the release exactly. **This is DP-SHAPED
    * deterministic noise for oracle parity, NOT a privacy
    * guarantee**: the hash input (cell key + the fixed 'dp:' salt)
    * is publicly computable, so an adversary can regenerate the
    * noise and subtract it. A real ε-DP release must draw u from a
    * SECRET seed (pass the salt as a caller-held secret, or a true
    * PRNG with budget accounting) — and note the stated sensitivity
    * unit is per EVENT (one event changes one cell count by 1); for
    * user-level DP the sensitivity is each user's max per-cell event
    * count and b must scale accordingly. Noise and the released
    * value land on the 1e-6 grid (the q126 ln discipline); the true
    * count is emitted alongside for audit parity only — a production
    * release drops `n_raw`.
    *
    * Scale shape: one hash aggregation on the bounded
    * (event_type, day) key space (map-side combined), then one
    * map-only expression per released cell. Noise cost is per CELL,
    * not per event — free at 100 TB.
    */
  def dpCountRelease(events: DataFrame, epsilon: Double): DataFrame = {
    require(epsilon > 0, s"need epsilon > 0, got $epsilon")
    val b = 1.0 / epsilon
    val cells = events
      .groupBy(col("event_type"), expr(s"ts_us DIV ${DayUs}L").as("day"))
      .agg(count(lit(1)).as("n_raw"))
    val uExpr = s"""(CAST(${graft.functions.PortableHash.hash48(
      "concat('dp:', event_type, ':', CAST(day AS STRING))")} AS DOUBLE)
        + 0.5) / 281474976710656.0"""
    cells
      .withColumn("u", expr(uExpr))
      .withColumn("noise", graft.functions.Deterministic.roundTo(
        expr(s"""-$b * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                 * ln(1.0 - 2.0 * abs(u - 0.5))"""), 6))
      .withColumn("released", graft.functions.Deterministic.roundTo(
        col("n_raw") + col("noise"), 6))
      .select("event_type", "day", "n_raw", "noise", "released")
      .orderBy("event_type", "day")
  }
}
