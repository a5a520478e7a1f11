package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Contracts of budget selection (Q62) beyond the row-hash oracle: the
  * selection is exactly the greedy top-quality suffix of histogram
  * cells (driver replay), never exceeds the budget, and the admission
  * pass is a broadcast semi-join — no sort-merge of the corpus, no
  * un-partitioned window (the registry-wide PlanAudit covers the
  * window; the join shape is asserted here).
  */
class BudgetSelectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Budget = 3000L
  private val Bins = 20

  private lazy val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("selection equals the driver-replayed cell-suffix rule and fits the budget") {
    val scored = TextAnalysis.qualityLangId(docs)
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cellOf = scored.map { case (id, n, q) =>
      (id, n, math.min(Bins - 1L, math.floor(q * Bins).toLong))
    }
    val cellTokens = cellOf.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val keptCells = cellTokens.keySet.filter { c =>
      cellTokens.filterKeys(_ >= c).values.sum <= Budget
    }
    val wantIds = cellOf.filter(r => keptCells.contains(r._3)).map(_._1).sorted.toSeq

    val got = TextAnalysis.budgetSelect(docs, Budget, Bins).collect()
    assert(got.map(_.getLong(0)).toSeq == wantIds)
    val total = got.map(_.getLong(1)).sum
    assert(total <= Budget, s"selected $total tokens > budget $Budget")
    assert(got.nonEmpty, "budget should admit at least the top cells on this corpus")

    // Conservative boundary: adding the next cell down would overflow.
    val excludedCells = cellTokens.keySet -- keptCells
    if (excludedCells.nonEmpty) {
      val boundary = excludedCells.max
      assert(total + cellTokens(boundary) > Budget,
        "a whole excluded cell would still fit — selection not maximal")
    }
  }

  test("admission is a broadcast semi-join; the corpus is never sort-merge shuffled") {
    val plan = TextAnalysis.budgetSelect(docs, Budget, Bins)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi-join admission:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus sort-merged:\n$plan")
  }
}
