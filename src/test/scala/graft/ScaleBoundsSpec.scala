package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Dedup, Pipeline}

/** Output-row bounds for the three scale-smoke items whose 10× wall
  * ratios drift upward round over round (neardup_pairs, cluster_split,
  * attribution). The claim under test is "the ratio grew because the
  * OUTPUT grew, within its declared bound" — so each gets its
  * rows-per-input contract pinned on the same synthetic c-copy corpus
  * the smoke harness scales with (ScaleSmoke.scaledDocs/scaledEvents at
  * sf0.001, c=3). SCALESMOKE artifacts now carry rows1x/rows10x so the
  * normalized per-row ratio is directly readable.
  */
class ScaleBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private val copies = 3

  test("neardup_pairs output obeys the banded-bucket bound; copy twins collide as designed") {
    val docs1 = ScaleSmoke.scaledDocs(spark, sf, 1)
    val docs3 = ScaleSmoke.scaledDocs(spark, sf, copies)
    val n1 = docs1.count(); val n3 = docs3.count()
    val p1 = Dedup.nearDupPairs(docs1, 0.2).count()
    val p3 = Dedup.nearDupPairs(docs3, 0.2).count()
    // Hard cap: a doc meets at most (MaxBucket-1) partners per band —
    // the skew gate that keeps a hot bucket from going quadratic.
    assert(p3 <= Dedup.NumBands.toLong * n3 * (Dedup.MaxBucket - 1) / 2,
      s"pairs $p3 exceed the banded-bucket cap")
    // The c-copy corpus plants C(c,2) twin pairs per base doc (near-
    // but-not-exact dups): the output MUST grow superlinearly — that
    // growth, not compute, is what the rising smoke ratio tracks.
    assert(p3 > p1 * copies,
      s"dense twins must add pairs beyond corpus growth (1x=$p1, ${copies}x=$p3)")
    // And stays within the planted structure: natural near-dup pairs
    // multiply ACROSS copies (every copy of doc i collides with every
    // copy of its natural partner j: ×c²), plus C(c,2) twin pairs per
    // base doc. Anything beyond that bound would be fabricated pairs.
    val bound = p1 * copies * copies + n1.toLong * copies * (copies - 1) / 2
    assert(p3 <= bound, s"pairs $p3 exceed natural×c² + planted twins ($bound)")
  }

  test("kanon_release output is bounded by the cell space; every event is decided EXACTLY once (released at one level, or its residual provably fails k)") {
    import graft.operators.Privacy
    val k = 5
    // 3,600,000,000 / 86,400,000,000 µs = Privacy's hour/day cells.
    val HourUs = 3600L * 1000000L; val DayUs = 86400L * 1000000L
    for (c <- Seq(1, copies)) {
      val ev = ScaleSmoke.scaledEvents(spark, sf, c)
      val e = ev.select(col("event_type"), col("user_id"),
        expr(s"ts_us DIV ${HourUs}L").as("hour"),
        expr(s"ts_us DIV ${DayUs}L").as("day")).cache()
      val rel = Privacy.kAnonRelease(ev, k).cache()
      // Output is CELL-space bounded — constant-ish rows at any input
      // scale (the SCALESMOKE constant-3,600-row observation is the
      // contract, not an accident).
      val hourCells = e.select("event_type", "hour").distinct().count()
      val dayCells = e.select("event_type", "day").distinct().count()
      val types = e.select("event_type").distinct().count()
      assert(rel.count() <= hourCells + dayCells + types,
        s"[$c x] release rows exceed the cell space")
      // Every released row clears k — no level leaks a small cohort.
      assert(rel.where(col("n_users") < k).isEmpty, s"[$c x] sub-k release")
      // Exactly one decision per event: events in cells NOT released
      // at hour or day level must reconcile with the type-level
      // residual — equal to the suppressed row when one exists, and
      // provably below k distinct users when none does. This is the
      // inverse-side conservation proof, computed WITHOUT re-running
      // the operator's own cascade.
      val hourRel = rel.where(col("level") === "hour")
        .select(col("event_type"), col("bucket").as("hour"))
      val dayRel = rel.where(col("level") === "day")
        .select(col("event_type"), col("bucket").as("day"))
      val leftover = e.join(hourRel, Seq("event_type", "hour"), "left_anti")
        .join(dayRel, Seq("event_type", "day"), "left_anti")
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"))
      val supp = rel.where(col("level") === "suppressed")
        .select(col("event_type"), col("n_users"), col("n_events"))
      val joined = leftover.join(supp, Seq("event_type"), "left").collect()
      joined.foreach { r =>
        if (r.isNullAt(3)) // no residual release: it must FAIL k
          assert(r.getLong(1) < k,
            s"[$c x] ${r.getString(0)}: $r — an above-k residual was dropped")
        else {
          assert(r.getLong(3) == r.getLong(1) && r.getLong(4) == r.getLong(2),
            s"[$c x] ${r.getString(0)}: residual release != leftover events $r")
        }
      }
      // And no suppressed row without leftover events behind it.
      assert(supp.join(leftover, Seq("event_type"), "left_anti").isEmpty,
        s"[$c x] a type-level release exists with no failing cells behind it")
      e.unpersist(); rel.unpersist()
    }
  }

  test("cluster_split output is exactly one row per input document — its ratio drift is graph density, never output blowup") {
    val docs3 = ScaleSmoke.scaledDocs(spark, sf, copies)
    val out = Pipeline.clusterSafeSplit(docs3, 0.2, "sm")
    assert(out.count() == docs3.count(), "one split assignment per document")
    assert(out.select("doc_id").distinct().count() == docs3.count(),
      "no document assigned twice")
  }

  test("attribution's per-conversion summary is bounded by the purchase count and exactly additive over disjoint user copies") {
    val w = 604800000000L
    val ev1 = ScaleSmoke.scaledEvents(spark, sf, 1)
    val ev3 = ScaleSmoke.scaledEvents(spark, sf, copies)
    val c1 = Behavior.conversionTouches(ev1, w).count()
    val c3 = Behavior.conversionTouches(ev3, w).count()
    assert(c3 <= ev3.where(col("event_type") === "purchase").count(),
      "at most one summary row per converting purchase")
    // Disjoint user copies ⇒ exact additivity: per-user windows carry
    // no cross-copy touches, so the change-bounded intermediate scales
    // linearly with the corpus BY CONSTRUCTION.
    assert(c3 == copies * c1,
      s"disjoint copies must be exactly additive (1x=$c1, ${copies}x=$c3)")
    // The report itself is aggregate-bounded: (model × touch_type).
    assert(Behavior.attributionReport(ev3, w).count() <= 9)
  }
}
