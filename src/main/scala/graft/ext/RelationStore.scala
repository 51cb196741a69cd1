package graft.ext

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame

/** Generic build-once MATERIALIZED STATE for derived relations: the
  * first caller for a key computes the relation and persists it to
  * parquet; every later consumer (and every later query in the same
  * JVM) reads it back as a plain scan. This is the offline-state
  * pattern [[IvfStore]] applies to the ANN index, factored for any
  * single-relation state — e.g. dedup component labels, which
  * `x_dedup_components` and `x_dedup_canonical` both need: computing
  * the iterative label propagation twice per corpus would double the
  * most expensive stage of the dedup surface for no new information.
  *
  * Parquet (not `localCheckpoint`) deliberately: checkpoint blocks
  * are pinned executor memory that bench/test harnesses drop between
  * passes — and a dropped checkpoint cannot recompute (truncated
  * lineage), so memoizing one would poison later passes. Stored
  * parquet survives block eviction, reads back with partition
  * parallelism, and is exactly how a production pipeline shares a
  * derived relation across jobs.
  *
  * Same safety contract as IvfStore: per-(JVM, key) memo with
  * PER-KEY locking — same-key callers serialize (the single-build
  * guarantee `RelationStoreSpec` races), while builds of DIFFERENT
  * keys run concurrently: `computeIfAbsent` only registers a lazy
  * thunk (cheap, so the map's internal lock is held for ns), and the
  * corpus-scale build itself runs under that thunk's own monitor.
  * With 11 relations riding this store, one slow build must not
  * gate every other stored-state access in concurrent sessions.
  * Staged write + rename so a crashed build is never read as
  * complete; pid-scoped root reaped by a shutdown hook.
  */
object RelationStore {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, () => String]()

  private lazy val root: String = {
    val r = System.getProperty("java.io.tmpdir") +
      s"/graft-state-p${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      FileUtils.deleteQuietly(new File(r))))
    r
  }

  /** Path of the stored relation for `key`, building it via `build`
    * if this JVM hasn't yet.
    *
    * The key must identify the corpus SNAPSHOT, not merely a path: a
    * corpus mutated in place under the same key would read stale
    * state. The bench/test corpora are immutable by contract
    * (TESTDATA.md), so their dir IS their snapshot id; a production
    * caller keys by content version — e.g. `SnapshotPublish`'s
    * published version number.
    */
  def ensure(key: String)(build: => DataFrame): String = {
    // register a lazy thunk under the map's (brief) bin lock; the
    // FIRST registered thunk wins for the key, and its `lazy val`
    // monitor is what same-key callers then serialize on — the build
    // job itself never runs inside the shared map lock
    val thunk = built.computeIfAbsent(key, _ => {
      lazy val path: String = StoreTimer.time(key) {
        val sub = s"$root/" + key.replaceAll("[^A-Za-z0-9.]", "_").replaceAll("^_+", "")
        val stage = new File(sub + ".build")
        FileUtils.deleteQuietly(new File(sub))
        FileUtils.deleteQuietly(stage)
        build.write.parquet(stage.getPath)
        FileUtils.moveDirectory(stage, new File(sub))
        sub
      }
      () => path
    })
    // a FAILED build must not stay registered: the memoized thunk
    // captured the failing caller's build closure, so a retry through
    // it would re-run the crashed build forever — deregister (only if
    // still ours, so a concurrent successful rebuild isn't evicted)
    // and let the next ensure() register its own closure fresh
    try thunk()
    catch { case e: Throwable => built.remove(key, thunk); throw e }
  }

  /** Test seam: forget the in-memory memo so a spec can exercise a
    * fresh build (stored files are left to the shutdown hook).
    */
  def reset(): Unit = built.clear()
}
