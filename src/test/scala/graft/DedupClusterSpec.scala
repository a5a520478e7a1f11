package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Connected-component clustering over near-dup pairs: the properties
  * the DuckDB oracle can't stress on the natural corpus — transitive
  * chains much longer than any plausible fixed round cap, which the
  * pointer-jumped label propagation must collapse in O(log n) rounds.
  */
class DedupClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a 60-link transitive chain collapses to ONE cluster (diameter >> naive round budget)") {
    import spark.implicits._
    // Sliding-window documents: doc i = words[i .. i+40]. Adjacent docs
    // share 38/40 shingles (J ≈ 0.95 ≥ 0.9); docs two apart share
    // 37/41 (J ≈ 0.90... below after the strict >= on rounded 0.9024?
    // — at threshold 0.92 only ADJACENT pairs qualify), so the cluster
    // graph is a path of diameter 59: min-label needs 59 naive rounds,
    // pointer jumping a handful.
    val words = (0 until 110).map(i => f"w$i%03d")
    val docs = (0 until 60)
      .map(i => (i.toLong, words.slice(i, i + 41).mkString(" ")))
      .toDF("doc_id", "text")

    val out = Dedup.nearDupClusters(docs, 0.92)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    assert(out.length == 60, s"expected all 60 docs clustered, got ${out.length}")
    assert(out.forall(_._2 == 0L), "every doc must join the single chain cluster")
    assert(out.forall(_._3 == 60L), "cluster size must be the full chain")
    assert(out.count(_._4) == 1 && out.find(_._4).get._1 == 0L,
      "exactly the min member is canonical")
  }

  test("S8: streaming near-dup filter flags arrivals against all PRIOR batches, ≡ batch reference") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 30 base docs; batch 1 re-ingests 10 of them with light edits,
    // batch 2 re-ingests verbatim copies of 10 others plus fresh docs.
    val words = (0 until 80).map(i => f"w$i%03d")
    def doc(i: Int) = words.slice(i, i + 25).mkString(" ")
    val batch0 = (0 until 30).map(i => (i.toLong, doc(i)))
    val batch1 = (0 until 10).map(i => (100L + i, s"edit ${doc(3 * i)}"))
    val batch2 = (0 until 10).map(i => (200L + i, doc(2 * i + 1))) ++
      (0 until 5).map(i => (250L + i, words.reverse.slice(i * 10, i * 10 + 20).mkString(" ")))
    val batches = Seq(batch0, batch1, batch2)

    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .nearDupHits(src.toDF().toDF("doc_id", "text"), 0.5)
      .writeStream.format("memory").queryName("s8").outputMode("append").start()
    try batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("s8")
      .select("doc_id", "dup_of").distinct().as[(Long, Long)].collect().toSet

    // Batch reference: band-colliding pairs across DIFFERENT batches
    // (later arrival flagged against the earlier doc) with exact
    // Jaccard ≥ threshold — same expressions as the engine's own
    // batch LSH path.
    val all = batches.flatMap(identity).toDF("doc_id", "text")
    val banded = graft.operators.Dedup.bandedWithShingles(all)
    def batchOf(c: org.apache.spark.sql.Column) = (c / 100).cast("int")
    val want = banded.as("a").join(banded.as("b"), Seq("band", "band_sig"))
      .where(batchOf(col("a.doc_id")) > batchOf(col("b.doc_id")))
      .withColumn("jac", expr(
        "size(array_intersect(a.shingles, b.shingles)) / size(array_union(a.shingles, b.shingles))"))
      .where(col("jac") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet

    assert(got == want)
    assert(got.nonEmpty, "scenario must produce at least one dup hit")
    // Verbatim copies must be flagged with jaccard 1.0.
    val exact = spark.table("s8").where(col("jaccard") === 1.0).count()
    assert(exact >= 10, s"expected the 10 verbatim re-ingests flagged exact, got $exact")
  }

  test("S8b: near-dup index TTL — flags within horizon, evicts + re-seeds after idle") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // One 25-word doc = one fixed set of band buckets; `other` shares no
    // vocabulary, so its buckets are disjoint (it only drives batches so
    // idle timers can fire). Same scheduling contract as S14b: the
    // timer starts when doc 1's batch processes (at or after t0), so if
    // doc 2's batch lands within ttl of t0 the flag is guaranteed; on a
    // host contended past the ttl, skip that assertion rather than flake.
    val ttl = java.time.Duration.ofMillis(4000)
    val words = (0 until 30).map(i => f"w$i%03d")
    val text = words.take(25).mkString(" ")
    val other = (0 until 25).map(i => f"z$i%03d").mkString(" ")
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .nearDupHits(src.toDF().toDF("doc_id", "text"), 0.5, ttl = ttl)
      .writeStream.format("memory").queryName("s8b").outputMode("append").start()
    // With a processing-time timeout registered, processAllAvailable()
    // can block forever (batches run back-to-back); poll the sink for
    // flagged hits and use fixed waits for the no-hit steps.
    def hitsFor(id: Long): Long =
      spark.table("s8b").where(org.apache.spark.sql.functions.col("doc_id") === id).count()
    def awaitHit(id: Long): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (hitsFor(id) == 0 && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(hitsFor(id) > 0, s"timed out waiting for a dup hit on doc $id")
    }
    def settle(): Unit = Thread.sleep(700)
    try {
      val t0 = System.currentTimeMillis
      src.addData((1L, text)); settle()        // seeds the buckets
      src.addData((2L, text))                  // within TTL: flagged against doc 1
      // Poll until the hit lands or the TTL window has provably closed;
      // only a hit observed inside the window is a guaranteed outcome.
      while (hitsFor(2L) == 0 && System.currentTimeMillis - t0 < ttl.toMillis + 2000)
        Thread.sleep(50)
      assert(hitsFor(2L) > 0 || System.currentTimeMillis - t0 >= ttl.toMillis,
        "duplicate within the TTL horizon must be flagged")
      Thread.sleep(ttl.toMillis + 1500)        // idle past the TTL
      src.addData((50L, other)); settle()      // empty-for-the-bucket batch fires the timers → evict
      src.addData((3L, text)); settle()        // horizon passed: re-seeds, NOT flagged
      assert(hitsFor(3L) == 0,
        "duplicate after idle-past-TTL eviction must re-seed as fresh, not flag")
      // And the re-seeded index is live again: a further duplicate hits doc 3.
      src.addData((4L, text)); awaitHit(4L)
      val dupOf = spark.table("s8b")
        .where(org.apache.spark.sql.functions.col("doc_id") === 4L)
        .select("dup_of").distinct().as[Long].collect().toSet
      assert(dupOf == Set(3L), s"post-eviction duplicate must match the re-seed, got $dupOf")
    } finally q.stop()
  }

  test("S8 property: random corpora and batch splits — streaming hits ≡ batch reference") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (c <- 0 until 3) {
      val vocab = (0 until 40).map(i => f"v$i%02d")
      // ~Half the docs mutate an earlier doc (0-3 word swaps) so the
      // corpus carries genuine near-dups at unpredictable offsets.
      val texts = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      for (_ <- 0 until 36) {
        val w =
          if (texts.nonEmpty && rnd.nextBoolean()) {
            val base = texts(rnd.nextInt(texts.size)).toArray
            for (_ <- 0 to rnd.nextInt(3))
              base(rnd.nextInt(base.length)) = vocab(rnd.nextInt(vocab.size))
            base.toSeq
          } else Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        texts += w
      }
      // Random 3-way batch split; id encodes the batch (id / 100).
      val byBatch = texts.zipWithIndex
        .map { case (w, j) => (rnd.nextInt(3), w.mkString(" "), j) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, ds) =>
          ds.zipWithIndex.map { case ((_, t, _), j) => (b * 100L + j, t) }.toSeq }

      val src = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup
        .nearDupHits(src.toDF().toDF("doc_id", "text"), 0.4)
        .writeStream.format("memory").queryName(s"s8p$c").outputMode("append").start()
      try byBatch.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      val got = spark.table(s"s8p$c")
        .select("doc_id", "dup_of").distinct().as[(Long, Long)].collect().toSet

      val all = byBatch.flatten.toDF("doc_id", "text")
      val banded = graft.operators.Dedup.bandedWithShingles(all)
      val want = banded.as("a").join(banded.as("b"), Seq("band", "band_sig"))
        .where((col("a.doc_id") / 100).cast("int") > (col("b.doc_id") / 100).cast("int"))
        .withColumn("jac", expr(
          "size(array_intersect(a.shingles, b.shingles)) / size(array_union(a.shingles, b.shingles))"))
        .where(col("jac") >= 0.4)
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"case $c: streaming/batch mismatch")
    }
  }

  test("disjoint duplicate groups stay separate clusters") {
    import spark.implicits._
    // Three groups of 3 identical docs each — no cross-group similarity.
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "eta theta iota kappa lambda mu",
      "nu xi omicron pi rho sigma")
    val docs = (for (g <- 0 until 3; c <- 0 until 3)
      yield ((g * 10 + c).toLong, texts(g))).toDF("doc_id", "text")

    val out = Dedup.nearDupClusters(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 9)
    assert(out.groupBy(_._2).keySet == Set(0L, 10L, 20L), "min member labels clusters")
    assert(out.forall(_._3 == 3L))
  }
}
