package graft.ext

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The trained IVF index as OFFLINE STORED STATE — the production
  * lifecycle of an inverted-file ANN index, which r3/r4 only modeled
  * in-query: training is an offline job that runs ONCE per corpus
  * snapshot and persists two relations; every probe query then
  * consumes the stored relations as plain scans, paying zero training
  * cost. (Same stored-state pattern as the incremental-dedup sketch
  * index — `x_dedup_incremental` — applied to ANN.)
  *
  * Persisted layout (parquet under a pid-scoped scratch root):
  *  - `centroids/` — (c_id, c_emb, c_norm): the k trained centroids,
  *    hyperparameter-sized; reload via [[IvfIndex.pivotRow]] for
  *    out-of-corpus query assignment.
  *  - `assigned/`  — (vec_id, embedding, v_norm, cell, cell_rank):
  *    the corpus with BOUNDARY REPLICATION — each vector indexed
  *    under its top-`nassign` cells ([[IvfIndex.probeCells]]). At
  *    nassign=2 the index stores 2× rows; in exchange a query whose
  *    true neighbor lies just across a cell border still finds it in
  *    its own probe set. Measured on the (cluster-free, uniform-
  *    on-the-sphere) test embeddings at sf0.01: recall@1 at nprobe=2
  *    rises 0.40 → 0.80 for the same number of probed cells. Written
  *    `repartition(cell)` so each probe bucket is contiguous; at
  *    100 TB this relation is bucketed BY cell so the probe join is
  *    co-located with zero shuffle.
  *
  * Because queries in the benchmark surface are corpus members, their
  * probe cells at nprobe = n are exactly their stored assignment
  * cells at cell_rank <= n — so probing is a pure self-join of the
  * stored relation, touching neither the raw embeddings table nor the
  * centroids (the plan-audit proof that the index is materialized
  * state). Out-of-corpus queries would assign against the reloaded
  * centroid row instead, map-side.
  *
  * Build-once discipline: memoized per (JVM, corpus key) with
  * PER-KEY locking (same-key callers must not interleave
  * delete/write, so they serialize on the key's own lazy-thunk
  * monitor; different corpora build concurrently — see
  * [[RelationStore]] for the pattern), written to a `.build` staging
  * dir then renamed so a crashed build can never be read as a
  * complete index.
  */
object IvfStore {

  final case class StoredIndex(centroidsPath: String, assignedPath: String)

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, () => StoredIndex]()

  private val kMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private lazy val root: String = {
    val r = System.getProperty("java.io.tmpdir") +
      s"/graft-ivf-p${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      FileUtils.deleteQuietly(new File(r))))
    r
  }

  /** Train on `emb` — (vec_id, embedding, v_norm) — and persist; or
    * return the already-built index for this `key`. The offline step
    * costs `iters` corpus passes (each: map-side codegen'd assignment
    * + one k-row shuffle of exact integer sums) plus one assignment
    * pass for the replicated corpus — amortized over every probe
    * query against the snapshot. `key` must identify the corpus
    * SNAPSHOT (immutable test corpora key by dir; production keys by
    * content version) — see [[RelationStore]]'s staleness note.
    */
  def ensure(emb: DataFrame, key: String, k: Int, iters: Int,
      nassign: Int, dim: Int): StoredIndex = {
    val thunk = built.computeIfAbsent(key, _ => {
      lazy val idx: StoredIndex = StoreTimer.time(s"ivf:$key") {
        val sub = s"$root/" + key.replaceAll("[^A-Za-z0-9.]", "_").replaceAll("^_+", "")
        val stage = new File(sub + ".build")
        FileUtils.deleteQuietly(new File(sub))
        FileUtils.deleteQuietly(stage)
        val trained = IvfIndex.train(emb, k, iters, dim)
        IvfIndex.centroidRelation(trained, k)
          .coalesce(1) // k rows — hyperparameter-sized
          .write.parquet(s"$stage/centroids")
        IvfIndex.probeCells(emb, trained, k, nassign)
          .select(col("vec_id"), col("embedding"), col("v_norm"),
            col("cell"), col("cell_rank"))
          .repartition(col("cell"))
          .write.parquet(s"$stage/assigned")
        FileUtils.moveDirectory(stage, new File(sub))
        StoredIndex(s"$sub/centroids", s"$sub/assigned")
      }
      () => idx
    })
    // deregister on failure — same contract as RelationStore.ensure:
    // a memoized FAILING thunk would re-run the crashed build closure
    // on every retry; removal is conditional so a concurrent rebuild
    // that already succeeded isn't evicted
    try thunk()
    catch { case e: Throwable => built.remove(key, thunk); throw e }
  }

  /** The index's cell count k, memoized per (JVM, corpus key) on the
    * SAME lifecycle as the stored index itself — deliberately, not as
    * a cache convenience: serving-side k (probe widths, oracle CTEs)
    * must match the k the frozen index was BUILT with, so if the
    * corpus under `key` grows mid-process, a re-counted k would
    * disagree with the stored index while this memo stays consistent
    * with it. (`pqServeC` dropped its own memo in r9 precisely
    * because it was NOT tied to a store lifecycle; this one is.)
    * [[reset]] clears both maps together, so an in-process corpus
    * rebuild gets a freshly counted k and a freshly built index.
    */
  def kFor(key: String)(compute: => Int): Int =
    kMemo.computeIfAbsent(key, _ => Int.box(compute)).intValue()

  /** Test seam: forget the in-memory memos (stored files are left to
    * the shutdown hook) so a spec can exercise a fresh build.
    */
  def reset(): Unit = { built.clear(); kMemo.clear() }
}
