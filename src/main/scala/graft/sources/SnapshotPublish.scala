package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic MULTI-TABLE publish: several sinks become visible to
  * readers as ONE unit, or not at all — the cross-sink transactional
  * boundary the reference lacks (`main.py:235-304` writes warehouse,
  * enterprise and the flag-reset curated table sequentially; a crash
  * between them leaves the three stores at DIFFERENT versions, the
  * exact inconsistency its `Is_updated` dirty flag then papers over).
  *
  * Commit protocol (a minimal versioned-snapshot log, the same
  * shape lakehouse formats use for single-table commits, applied
  * across tables):
  *
  *  - each publish writes EVERY table under a fresh staging dir, then
  *    renames it to `v=<n>/` (one FS metadata op);
  *  - an empty `_PUBLISHED` marker file is created inside `v=<n>`
  *    LAST — one atomic file creation is the entire commit;
  *  - readers resolve the CURRENT version as the highest `v=<n>`
  *    carrying the marker. A publisher crash at ANY point — during a
  *    table write, between tables, after the rename but before the
  *    marker — leaves no marker, so every reader keeps resolving the
  *    previous version for ALL tables: all-old or all-new, never
  *    mixed ([[graft.pipeline.CovidPipelineSpec]] kills a publish
  *    between sink writes and proves exactly this).
  *
  * Scale shape: the protocol costs one rename + one file create per
  * publish regardless of data size; table writes inside the staging
  * dir carry whatever parallelism their plans have. Version history
  * doubles as time travel until [[vacuum]] prunes it. Single-writer
  * by contract (the reference is one daily orchestrated job); a lost
  * rename race is detected and raised, never silently merged.
  */
object SnapshotPublish {

  private val Marker = "_PUBLISHED"
  private def versionDir(n: Long) = f"v=$n%08d"
  // 8+ digits: %08d pads small versions but NEVER truncates — a log
  // past 10^8 publishes still lists (and sorts numerically, since we
  // parse the number rather than compare names)
  private val VersionRe = "v=(\\d{8,})".r

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All version numbers present under root (published or not —
    * failed attempts still claim their number, so the next publish
    * never collides with debris).
    */
  private def versions(fs: FileSystem, root: Path): Seq[(Long, Path, Boolean)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case s if s.isDirectory && VersionRe.pattern.matcher(s.getPath.getName).matches() =>
        val n = s.getPath.getName.stripPrefix("v=").toLong
        (n, s.getPath, fs.exists(new Path(s.getPath, Marker)))
    }

  /** The current (highest PUBLISHED) version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, r) = fsOf(spark, root)
    versions(fs, r).collect { case (n, _, true) => n }.maxOption
  }

  /** Publish `tables` (written in the given order) as one atomic
    * version; returns the version number.
    */
  def publish(spark: SparkSession, root: String,
      tables: Seq[(String, DataFrame)]): Long = {
    require(tables.nonEmpty, "publish of zero tables")
    val (fs, r) = fsOf(spark, root)
    fs.mkdirs(r)
    val next = versions(fs, r).map(_._1).maxOption.getOrElse(0L) + 1
    val stage = new Path(r, s".stage-${versionDir(next)}-${java.util.UUID.randomUUID()}")
    val target = new Path(r, versionDir(next))
    try {
      tables.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(new Path(stage, name).toString)
      }
      if (fs.exists(target) || !fs.rename(stage, target))
        throw new java.io.IOException(
          s"snapshot publish lost the claim on $target (concurrent publisher?)")
      // the commit: one atomic empty-file creation makes every table
      // of this version visible together
      fs.create(new Path(target, Marker), false).close()
      next
    } finally {
      fs.delete(stage, true) // failed-attempt debris; no-op after rename
    }
  }

  /** Read `table` at the current published version — readers NEVER
    * see a half-published version (no marker, no resolution).
    */
  def readCurrent(spark: SparkSession, root: String, table: String): DataFrame =
    readAt(spark, root, table,
      currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no published snapshot under $root")))

  /** Time travel: read `table` at a specific PUBLISHED version (every
    * version a vacuum hasn't pruned remains readable — the reference's
    * `vacuum(0)` at `main.py:231-234` destroys exactly this ability).
    * Unmarked (crashed) versions are not readable: they were never
    * a consistent state.
    */
  def readAt(spark: SparkSession, root: String, table: String, version: Long): DataFrame = {
    val (fs, r) = fsOf(spark, root)
    val dir = new Path(r, versionDir(version))
    if (!fs.exists(new Path(dir, Marker)))
      throw new IllegalStateException(
        s"version $version under $root is not a published snapshot")
    spark.read.parquet(new Path(dir, table).toString)
  }

  /** Drop all but the newest `keep` published versions, plus ALL
    * unmarked version dirs and stale staging dirs — under the
    * single-writer contract no publish is in flight while vacuum
    * runs, so anything unmarked is crash debris by definition.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the current version")
    val (fs, r) = fsOf(spark, root)
    val all = versions(fs, r)
    val published = all.collect { case (n, _, true) => n }.sorted
    val cutoff = published.takeRight(keep).headOption.getOrElse(return)
    all.foreach { case (n, p, marked) =>
      if (!marked || n < cutoff) fs.delete(p, true)
    }
    if (fs.exists(r)) fs.listStatus(r).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith(".stage-"))
        fs.delete(s.getPath, true)
    }
  }
}
