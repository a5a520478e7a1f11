package graft.sources

/** This JVM's memoized-store decisions: store dir → "built" | "reused".
  *
  * Every `*Once` memoizer records which branch it took; the bench
  * artifact dumps the map (`store_provenance`), so cross-round
  * per-query comparisons are interpretable — a cold store re-runs a
  * real index build inside a timed query (the q89 0.26 s-memoized vs
  * 7.5 s-real spread), and without provenance that spread reads as a
  * plan regression (the round-12 verdict's Performance action item).
  * "built" wins over "reused": once any code path paid the build this
  * JVM, the timings downstream of it are build-contaminated.
  */
object StoreProvenance {
  private val state =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def built(dir: String): Unit = state.put(dir, "built")
  def reused(dir: String): Unit = state.putIfAbsent(dir, "reused")
  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    state.asScala.toMap
  }
}

/** Run independent driver-side steps (store builds, artifact writes)
  * CONCURRENTLY (optimization guide §2.6: Spark happily runs several
  * jobs at once — actions are only sequential because the driver calls
  * them sequentially, and each job's straggler tail otherwise leaves
  * the cluster idle). Steps must touch disjoint state (different
  * dirs / different store locks); results return in call order.
  */
private[graft] object ParallelSteps {
  def run[T](steps: (() => T)*): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    steps.map(st => Future(st())).map(Await.result(_, Duration.Inf))
  }
}
