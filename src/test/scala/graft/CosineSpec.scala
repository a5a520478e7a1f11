package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The codegen'd `cosine_sim` expression against its declarative
  * definition: bit-identical on the real embeddings corpus, and the
  * documented null/edge contract.
  */
class CosineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val foldSql =
    """aggregate(zip_with(a, b, (p, q) -> p * q), 0D, (acc, v) -> acc + v)
       / (sqrt(aggregate(a, 0D, (acc, v) -> acc + v * v))
          * sqrt(aggregate(b, 0D, (acc, v) -> acc + v * v)))"""

  test("cosine_sim is bit-identical to the declarative fold on the embeddings corpus") {
    val e = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("emb", col("embedding").cast("array<double>"))
    val pairs = e.select(col("vec_id").as("ida"), col("emb").as("a"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") < 3).select(col("vec_id").as("idb"), col("emb").as("b"))))
    val diff = pairs
      .withColumn("fast", expr("cosine_sim(a, b)"))
      .withColumn("slow", expr(foldSql))
      // bit-identical, not approximately equal: compare raw bits
      .where(expr("CAST(fast AS STRING) <> CAST(slow AS STRING)"))
    assert(diff.count() == 0)
  }

  test("null, length-mismatch, and empty-array contract") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))), // equal → 1.0
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))), // length mismatch → null
      (None, Some(Seq(1.0, 2.0))), // null input → null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))) // empty → NaN
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c"))
      .collect()
    assert(math.abs(df(0).getDouble(0) - 1.0) < 1e-15)
    assert(df(1).isNullAt(0) && df(2).isNullAt(0))
    assert(df(3).getDouble(0).isNaN)
  }

  test("kmeans step: per-dim counts equal cluster occupancy, full key space covered") {
    import graft.operators.Similarity
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val step = Similarity.kmeansStep(emb, 8)
    val sizes = Similarity.ivfClusterSizes(emb, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every populated (cid, dim) cell carries the cluster's full occupancy.
    val bad = step.collect().filterNot(r =>
      sizes(r.getLong(r.fieldIndex("cid"))) == r.getLong(r.fieldIndex("n")))
    assert(bad.isEmpty)
    // One cell per assigned centroid per dimension (64-dim corpus).
    assert(step.count() == sizes.size * 64L)
  }

  test("whole-stage codegen and interpreted eval agree") {
    val e = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("emb", col("embedding").cast("array<double>"))
      .limit(50)
    val q = e.select(col("vec_id"), expr("cosine_sim(emb, emb)").as("self"))
    val withCodegen = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(withCodegen == interpreted)
      assert(withCodegen.values.forall(v => math.abs(v - 1.0) < 1e-12))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
