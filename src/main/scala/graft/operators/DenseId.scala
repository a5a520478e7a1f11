package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed dense-id assignment (1, 2, 3, ... in a given total order)
  * without a single-task `Window.orderBy`.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses the
  * whole relation into one task — invisible at test SF, a scale-killer at
  * 100 TB cardinalities. The scale-safe plan is the classic two-pass
  * scheme, which is exactly what `RDD.zipWithIndex` implements:
  *
  *   1. range-partition by the order columns (parallel sampling pass
  *      picks boundaries), sort within each partition — together these
  *      give a global total order across partitions;
  *   2. one lightweight job counts rows per partition; each partition
  *      then stamps `offset + localIndex` in parallel.
  *
  * The assigned ids depend only on the total order, not on where the
  * sampled range boundaries land, so the result is deterministic as long
  * as the order columns form a total order (callers must include a
  * unique tie-break column).
  */
object DenseId {

  /** Append `idCol` = 1-based dense rank of each row under `orderCols`
    * (which must be a total order). Output partitioning: range on
    * `orderCols`, sorted — downstream `orderBy(idCol)` is nearly free.
    */
  def withDenseId(df: DataFrame, orderCols: Seq[Column], idCol: String): DataFrame = {
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
