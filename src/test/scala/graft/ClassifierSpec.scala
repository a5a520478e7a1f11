package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

/** Pins [[graft.operators.Classifier]] — in-engine integer-perceptron
  * training (q81/q81b): the loop LEARNS (accuracy 1.0 on a linearly
  * separable fixture), converges to a fixpoint that makes the capped
  * loop equal any longer unroll, and is exact integer arithmetic
  * (margins are reproducible BIGINTs, invariant to input layout).
  */
class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("classifier-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Linearly separable corpus: 'en' docs draw from one vocabulary,
    * 'de' docs from a disjoint one — a perceptron must reach training
    * accuracy 1.0, proving the loop learns rather than just running.
    */
  private def separableDocs = {
    import spark.implicits._
    (0L until 40L).map { id =>
      val en = id % 2 == 0
      val words =
        if (en) Seq("alpha", "bravo", "charlie", "alpha")
        else Seq("delta", "echo", "foxtrot", "delta")
      // Vary length so counts differ doc to doc.
      val text = (words ++ words.take((id % 3).toInt)).mkString(" ")
      (id, text, if (en) "en" else "de")
    }.toDF("doc_id", "text", "lang")
  }

  test("perceptron reaches accuracy 1.0 on a linearly separable corpus") {
    val scored = Classifier.perceptronScore(separableDocs, 32, 10, "en").collect()
    assert(scored.length == 40)
    val wrong = scored.count(r => r.getLong(1) != r.getLong(3))
    assert(wrong == 0, s"$wrong of 40 docs misclassified after training")
  }

  test("fixpoint early-exit equals a longer unroll") {
    val at10 = Classifier.perceptronTrain(separableDocs, 32, 10, "en")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val at25 = Classifier.perceptronTrain(separableDocs, 32, 25, "en")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(at10 == at25, "converged weights must be stable under more rounds")
  }

  test("training is exact and layout-invariant (integer margins)") {
    val base = Classifier.perceptronScore(separableDocs, 32, 4, "en")
      .collect().map(_.toSeq).toSeq
    val shuffled = Classifier.perceptronScore(
        separableDocs.repartition(7), 32, 4, "en")
      .collect().map(_.toSeq).toSeq
    assert(base == shuffled, "margins must not depend on partitioning")
    // Weight-vector sanity: bias + every en-vocab bucket nonneg margin
    // contribution is already covered by accuracy; here pin that the
    // weight frame is the full dense j-range.
    val w = Classifier.perceptronTrain(separableDocs, 32, 4, "en").collect()
    assert(w.map(_.getLong(0)).toSeq == (0L to 32L),
      "weights must cover every bucket plus the bias row")
  }
}
