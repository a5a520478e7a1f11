package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Point-in-time (as-of) join — the time-series primitive Spark's
  * built-in join surface lacks (kdb `aj`, DuckDB/QuestDB `ASOF JOIN`,
  * Pandas `merge_asof`): for each left row, attach the single right
  * row with the greatest right-time ≤ the left row's time within the
  * same key. The reference's latest-state-per-key read
  * (stateStream.go:19-21) is the degenerate case (left time = now);
  * this is the general one a feature pipeline needs ("the price/state/
  * model version in force when the event happened").
  * [[Temporal.asofLastView]] (q28) is the SAME-TABLE special case —
  * when both sides are rows of one frame, a single window suffices;
  * this operator is the general two-table form (distinct schemas,
  * left/inner variants, payload-clash guard), and its oracle is
  * DuckDB's NATIVE `ASOF JOIN` rather than a window restatement.
  *
  * Scale shape — why NOT the obvious plans:
  *   - `l JOIN r ON l.k = r.k AND l.t >= r.t` + per-pair argmax is a
  *     per-key cross product: a hot key with n lefts × m rights
  *     materializes n·m rows before the argmax prunes them. Catalyst
  *     can only pick sort-merge on the equi half and filters the
  *     inequality AFTER the pair explosion.
  *   - a correlated "max right ≤ t" subquery re-scans the right side
  *     per left row.
  * Instead both sides UNION into one stream, shuffle ONCE on the key,
  * sort within partitions by (time, side), and each left row picks up
  * the latest right payload via a running `last(ignoreNulls)` over an
  * unbounded-preceding ROW frame — O(n log n) per partition, zero row
  * amplification, and the running frame is the streaming-friendly
  * WindowExec special case (UnboundedPreceding→CurrentRow needs no
  * frame re-scan per row). Right rows sort BEFORE left rows at equal
  * time, implementing the INCLUSIVE (≥) bound.
  */
object AsofJoin {

  /** Backward as-of join of `left` to `right` on `key`.
    *
    * Contract: `right`'s columns are (key, rightTs, payload…) with
    * payload names disjoint from `left`'s columns, and `right` is
    * UNIQUE per (key, rightTs) — dedupe upstream (ties would make the
    * match nondeterministic in ANY engine). `inner` drops left rows
    * with no right row at or before them; otherwise their payload is
    * null (left as-of).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String], inner: Boolean): DataFrame = {
    val matched = matchedBackward(left, right, key, leftTs, rightTs, payload)
    finish(matched, payload, col("_m"), inner)
  }

  /** Forward as-of join: each left row attaches the right row with the
    * SMALLEST right-time ≥ its time (inclusive — a right row at the
    * exact left time matches), within the key. Same union + one key
    * shuffle + running window shape as [[asofJoin]], mirrored: right
    * rows sort AFTER left rows at equal time so the currentRow→
    * unboundedFollowing frame's `first(ignoreNulls)` implements ≤.
    * The "next purchase after the click" / time-to-conversion query.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      payload: Seq[String], inner: Boolean): DataFrame = {
    requireNoClash(left, payload)
    val r = right.select(
      col(key), col(rightTs).cast("long").as("_t"),
      struct(payload.map(col): _*).as("_p"),
      lit(2).as("_side"))
    val l = left
      .withColumn("_t", col(leftTs).cast("long"))
      .withColumn("_side", lit(1))
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", first(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    finish(matched, payload, col("_m"), inner)
  }

  /** Nearest as-of join with a mandatory tolerance (Pandas
    * `merge_asof(direction='nearest', tolerance=…)`): each left row
    * attaches whichever of its backward / forward candidates has the
    * smaller absolute time gap, ties to the BACKWARD (earlier) row —
    * the deterministic tie rule — and any candidate farther than
    * `tolerance` time units is out of reach. One union + one key
    * shuffle; BOTH candidates come from the same sorted pass (the
    * backward running `last` and the forward running `first`), so
    * nearest costs exactly what one directional as-of costs.
    *
    * An equal-time right row is the backward candidate at gap 0 (it
    * beats every forward candidate), so exact matches always win.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      payload: Seq[String], tolerance: Long,
                      inner: Boolean): DataFrame = {
    require(tolerance >= 0L, "tolerance must be non-negative")
    requireNoClash(left, payload)
    val r = right.select(
      col(key), col(rightTs).cast("long").as("_t"),
      struct((col(rightTs).cast("long").as("_rt") +: payload.map(col)): _*).as("_p"),
      lit(0).as("_side"))
    val l = left
      .withColumn("_t", col(leftTs).cast("long"))
      .withColumn("_side", lit(1))
    val ord = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Right rows sort BEFORE left at equal time (side 0 < 1), so the
    // forward frame is exclusive (> t) — harmless: an equal-time right
    // is the gap-0 backward candidate and wins unconditionally.
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_mb", last(col("_p"), ignoreNulls = true).over(wb))
      .withColumn("_mf", first(col("_p"), ignoreNulls = true).over(wf))
      .where(col("_side") === 1)
    // Tolerance gates each candidate independently; nearest picks the
    // smaller gap among survivors, backward on ties (gaps are exact
    // longs — no float comparison anywhere).
    val gb = col("_t") - col("_mb").getField("_rt")
    val gf = col("_mf").getField("_rt") - col("_t")
    val vb = col("_mb").isNotNull && gb <= tolerance
    val vf = col("_mf").isNotNull && gf <= tolerance
    val chosen = when(vb && (!vf || gb <= gf), col("_mb"))
      .when(vf, col("_mf"))
    val matched = both.withColumn("_m", chosen)
    finish(matched, payload, col("_m"), inner).drop("_mb", "_mf")
  }

  private def requireNoClash(left: DataFrame, payload: Seq[String]): Unit = {
    val clash = left.columns.toSet.intersect(payload.toSet)
    require(clash.isEmpty, s"payload columns shadow left columns: $clash")
  }

  private def matchedBackward(left: DataFrame, right: DataFrame, key: String,
                              leftTs: String, rightTs: String,
                              payload: Seq[String]): DataFrame = {
    requireNoClash(left, payload)
    val r = right.select(
      col(key), col(rightTs).cast("long").as("_t"),
      struct(payload.map(col): _*).as("_p"),
      lit(0).as("_side"))
    val l = left
      .withColumn("_t", col(leftTs).cast("long"))
      .withColumn("_side", lit(1))
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
  }

  private def finish(matched: DataFrame, payload: Seq[String],
                     m: org.apache.spark.sql.Column, inner: Boolean): DataFrame = {
    val kept = if (inner) matched.where(m.isNotNull) else matched
    payload.foldLeft(kept) { case (df, c) => df.withColumn(c, m.getField(c)) }
      .drop("_t", "_side", "_p", "_m")
  }

  /** The `purchase` stream keyed for the right side: unique per
    * (user_id, ts_us) by keeping the greatest event_id — the
    * deterministic-tie contract [[asofJoin]] requires, stated in the
    * data rather than hidden in engine-specific tie-breaking.
    */
  private def purchasesOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "ts_us").orderBy(col("event_id").desc)))
      .where(col("rn") === 1)
      .select(col("user_id"), col("ts_us").as("purchase_ts_us"),
        col("value").as("purchase_value"))

  /** Q112 — for each click, the same user's most recent purchase at or
    * before it (left as-of: clicks with no prior purchase keep nulls).
    */
  def clickLastPurchase(spark: SparkSession, dir: String): DataFrame =
    clickPurchase(spark, dir, inner = false)

  /** Q112b — the inner variant: only clicks preceded by a purchase. */
  def clickLastPurchaseInner(spark: SparkSession, dir: String): DataFrame =
    clickPurchase(spark, dir, inner = true)

  private def clickPurchase(spark: SparkSession, dir: String,
                            inner: Boolean): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    asofJoin(clicks, purchasesOf(ev), "user_id", "ts_us", "purchase_ts_us",
      Seq("purchase_ts_us", "purchase_value"), inner)
      .orderBy("event_id")
  }

  /** Q112c — time-to-conversion: for each click, the same user's NEXT
    * purchase at or after it (forward as-of, left variant).
    */
  def clickNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    asofJoinForward(clicks, purchasesOf(ev), "user_id", "ts_us",
      "purchase_ts_us", Seq("purchase_ts_us", "purchase_value"), inner = false)
      .orderBy("event_id")
  }

  /** Q112d — attribution with a reach bound: for each click, the
    * nearest purchase in EITHER direction within `tolUs` microseconds
    * (ties to the earlier purchase); clicks with nothing in reach keep
    * nulls.
    */
  def clickNearestPurchase(spark: SparkSession, dir: String,
                           tolUs: Long): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    asofJoinNearest(clicks, purchasesOf(ev), "user_id", "ts_us",
      "purchase_ts_us", Seq("purchase_ts_us", "purchase_value"), tolUs,
      inner = false)
      .orderBy("event_id")
  }
}
