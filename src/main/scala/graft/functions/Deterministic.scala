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

  /** Cross-engine-stable rounding: `floor(x * 10^d + 0.5) / 10^d`.
    *
    * Engine-native `round()` is NOT portable on boundary values: Spark
    * routes doubles through BigDecimal (shortest-decimal repr) with
    * HALF_UP, DuckDB rounds the raw binary double — on an exact
    * `…5` boundary they can disagree by one ulp of the target scale.
    * This formula is pure IEEE arithmetic (multiply, add, floor,
    * divide), bit-identical in any engine. Use it for every rounded
    * value that is NOT already on a fixed decimal grid — ratios,
    * averages, cosines — i.e. wherever `round()` could see a boundary.
    * (Values from [[exactSum]] are already grid-aligned; native round
    * is safe there.)
    */
  def roundTo(c: Column, decimals: Int): Column = {
    val s = math.pow(10, decimals)
    floor(c * s + lit(0.5)) / s
  }
}
