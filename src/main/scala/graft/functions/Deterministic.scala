package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numeric aggregation.
  *
  * Summing doubles is order-dependent in the last ulp, and distributed
  * partial aggregation makes the order nondeterministic — so two engines
  * (or two runs) can disagree after `round()` when a value lands on a
  * rounding boundary. For fixed-decimal measures (money-like columns in
  * the test data carry ≤4 decimals) the fix is exact integer arithmetic:
  * scale each row to an integer (bit-identical everywhere, since per-row
  * IEEE ops are deterministic), sum integers (exact, order-free), and
  * divide back at the end.
  *
  * DuckDB oracle equivalent of `exactSum(x, 2)`:
  *   `CAST(sum(CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 100`
  */
object Deterministic {

  /** Exact, order-independent sum of a fixed-decimal double column. */
  def exactSum(c: Column, decimals: Int): Column = {
    val scale = math.pow(10, decimals)
    sum(round(c * scale, 0).cast("long")).cast("double") / scale
  }

  /** Exact-numerator average (denominator = row count of the group). */
  def exactAvg(c: Column, decimals: Int): Column =
    exactSum(c, decimals) / count(lit(1))
}
