package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Tripwire for the NEXT silent testdata/Spark flip: pins the Spark-side
  * read schema of every test table. When the driver regenerates parquet
  * with a different encoding (it has: events went TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS) between rounds) or a Spark upgrade changes type
  * inference, this spec names the exact column that moved instead of
  * letting half the query surface die with analysis errors.
  *
  * Deliberately a SCHEMA contract, not a content contract — content
  * goldens live in EventsReaderSpec (events) and the oracle gate (all
  * queries); this spec is the cheap structural first line.
  */
class TestdataContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fields(name: String): Seq[(String, DataType)] =
    Tables.table(spark, sf, name).schema.fields.toSeq.map(f => f.name -> f.dataType)

  private val L = LongType; private val I = IntegerType; private val S = StringType
  private val D = DoubleType; private val TS = TimestampType

  // The normalized engine-side contract per table. Events lists the
  // NORMALIZED columns (Tables.events adds ts_us/ts_ns whatever the
  // file encoding) — that indirection is exactly what survived the
  // round-5 flip, so it is what downstream operators may rely on.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> I, "r_name" -> S),
    "nation" -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> D, "c_mktsegment" -> S),
    "supplier" -> Seq("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I, "s_acctbal" -> D),
    "part" -> Seq("p_partkey" -> L, "p_name" -> S, "p_brand" -> S, "p_type" -> S,
      "p_size" -> I, "p_retailprice" -> D),
    "orders" -> Seq("o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
      "o_totalprice" -> D, "o_orderdate" -> TS, "o_orderpriority" -> S),
    "lineitem" -> Seq("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
      "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
      "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S, "l_linestatus" -> S,
      "l_shipdate" -> TS),
    "events" -> Seq("event_id" -> L, "ts" -> TS, "user_id" -> L, "event_type" -> S,
      "value" -> D, "props" -> S, "ts_us" -> L, "ts_ns" -> L),
    "documents" -> Seq("doc_id" -> L, "text" -> S, "lang" -> S, "source" -> S,
      "n_chars" -> L),
    "embeddings" -> Seq("vec_id" -> L, "embedding" -> ArrayType(FloatType), "label" -> I))

  Tables.all.foreach { t =>
    test(s"$t reads with the contracted engine-side schema") {
      val got = fields(t)
      val want = expected(t)
      assert(got == want,
        s"""|$t schema drifted — environment flip?
            |  got:  $got
            |  want: $want
            |If the parquet encoding changed, extend the reader (Tables) to
            |normalize it; if a type genuinely moved, update every operator
            |and oracle that touches it BEFORE updating this contract.""".stripMargin)
    }
  }
}
