package graft.ext

/** Per-store build-time ledger: every one-time stored-relation build
  * ([[RelationStore]], [[IvfStore]]) records its wall-clock seconds
  * here under its store key. `Bench` emits the snapshot as
  * `store_builds` in its JSON line, which is what makes the sf0.1→sf1
  * store-build growth a MEASURED per-store exponent instead of one
  * aggregate `store_build_s` number — at 100 TB the index/posting/
  * pair-graph builds dominate wall-clock, and their growth rate is
  * the question that decides whether the engine's offline state is
  * affordable (the r10 verdict's item 7).
  *
  * Timings are diagnostics, not query results: nothing in any oracle
  * query reads this map, so it cannot affect correctness.
  */
object StoreTimer {

  private val times =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `f`, recording its wall-clock seconds under `key`. A re-run
    * of the same key (test seam resets) overwrites — the latest build
    * is the one a bench session reads.
    */
  def time[T](key: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val out = f
    times.put(key, Double.box((System.nanoTime() - t0) / 1e9))
    out
  }

  /** Immutable snapshot of every recorded build time (seconds). */
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    times.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap
  }

  def reset(): Unit = times.clear()
}
