package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A publisher lost the race for a version number: another writer
  * claimed it first. The losing publish wrote NOTHING visible — retry
  * lands at the next free version (which [[SnapshotPublish.publish]]
  * does automatically), mirroring the optimistic-concurrency loop
  * lakehouse formats run on commit conflicts (the reference gets this
  * guarantee from Delta's OCC inside its MERGE at
  * `/root/reference/utils/load_functions.py:64-122`).
  */
final class ConcurrentPublishException(message: String)
  extends RuntimeException(message)

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
  *  - a publisher first CLAIMS its version number with one atomic
  *    exclusive file creation (`v=<n>.claim`) — two racing publishers
  *    computing the same `n` cannot both succeed; the loser raises
  *    [[ConcurrentPublishException]] and retries at the next number.
  *    Claimed-but-never-published numbers are never reused while the
  *    claim stands, so a crashed publisher can't collide with a live
  *    one;
  *  - the claim holder writes EVERY table under a fresh staging dir,
  *    then renames it to `v=<n>/` (one FS metadata op);
  *  - an empty `_PUBLISHED` marker file is created inside `v=<n>`
  *    LAST — one atomic file creation is the entire commit;
  *  - readers resolve the CURRENT version as the highest `v=<n>`
  *    carrying the marker. A publisher crash at ANY point — during a
  *    table write, between tables, after the rename but before the
  *    marker — leaves no marker, so every reader keeps resolving the
  *    previous version for ALL tables: all-old or all-new, never
  *    mixed ([[graft.pipeline.CovidPipelineSpec]] kills a publish
  *    between sink writes and proves exactly this; `SnapshotPublishSpec`
  *    races publishers and proves the claim protocol).
  *
  * Scale shape: the protocol costs two file creates + one rename per
  * publish regardless of data size; table writes inside the staging
  * dir carry whatever parallelism their plans have. Version history
  * doubles as time travel until [[vacuum]] prunes it — and vacuum
  * carries a minimum-age retention guard so pruning can't yank files
  * out from under a reader's lazy scan (the failure mode Delta's
  * `retentionDurationCheck` exists for, which the reference disables
  * at `extract_functions.py:67` with `vacuum(0)`).
  *
  * ==Required filesystem contract (object-store caveat)==
  * The protocol's atomicity rests on exactly two primitives of the
  * Hadoop `FileSystem` it runs on:
  *  1. '''exclusive create''' — `create(path, overwrite=false)` must
  *     fail atomically when the path exists (the claim);
  *  2. '''atomic directory rename''' — `rename(stage, target)` must
  *     move the whole tree as one metadata operation, failing (not
  *     merging) if `target` appeared concurrently.
  * HDFS and local/POSIX filesystems provide both, so the guarantees
  * above hold there as written. S3-style object stores provide
  * NEITHER: `create(…, false)` is a last-writer-wins PUT (two racing
  * claimants can both "succeed"), and "rename" is a non-atomic
  * client-side copy+delete that readers can observe half-done. On
  * such stores this class must not be used bare — the same gap that
  * drives Delta/Iceberg to require a coordination layer there
  * (S3 DynamoDB/conditional-write LogStores, a Hive/REST catalog's
  * atomic pointer swap). The minimal adaptation is to route ONLY the
  * two primitives through a CAS service (claim = conditional PUT of
  * `v=<n>.claim`, commit = conditional PUT of the marker naming the
  * staged prefix, readers resolve through markers alone and never
  * assume the version dir is complete without one); the staged data
  * writes need no coordination in either world. Until such a LogStore
  * is plugged in, deploy the snapshot log on a filesystem with real
  * exclusive-create + atomic-rename semantics (HDFS, POSIX, ADLS
  * Gen2 with hierarchical namespace).
  */
object SnapshotPublish {

  private val Marker = "_PUBLISHED"
  private def versionDir(n: Long) = f"v=$n%08d"
  // 8+ digits: %08d pads small versions but NEVER truncates — a log
  // past 10^8 publishes still lists (and sorts numerically, since we
  // parse the number rather than compare names)
  private val VersionRe = "v=(\\d{8,})".r
  private val ClaimRe = "v=(\\d{8,})\\.claim".r

  /** Default [[vacuum]] retention: versions younger than this are
    * never pruned, whatever `keep` says. Generous on purpose — a
    * reader that resolved a version holds only lazy file references;
    * the age guard is what keeps those files alive until any sane
    * query over them has finished.
    */
  val DefaultRetentionMillis: Long = 7L * 24 * 60 * 60 * 1000

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

  /** Version numbers claimed by some publisher (live or crashed) that
    * may not have a version dir yet.
    */
  private def claims(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case s if !s.isDirectory && ClaimRe.pattern.matcher(s.getPath.getName).matches() =>
        (s.getPath.getName.stripPrefix("v=").stripSuffix(".claim").toLong, s.getPath)
    }

  private def nextVersion(fs: FileSystem, root: Path): Long =
    (versions(fs, root).map(_._1) ++ claims(fs, root).map(_._1))
      .maxOption.getOrElse(0L) + 1

  /** The current (highest PUBLISHED) version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, r) = fsOf(spark, root)
    versions(fs, r).collect { case (n, _, true) => n }.maxOption
  }

  /** Publish `tables` at EXACTLY `version`, or raise
    * [[ConcurrentPublishException]] if another publisher holds that
    * number. The claim — one exclusive file create — happens BEFORE
    * any data is written, so a lost race costs a filesystem round
    * trip, not a wasted staging write.
    */
  def publishAt(spark: SparkSession, root: String,
      tables: Seq[(String, DataFrame)], version: Long): Long = {
    require(tables.nonEmpty, "publish of zero tables")
    require(version >= 1, s"versions start at 1, got $version")
    val (fs, r) = fsOf(spark, root)
    fs.mkdirs(r)
    val claim = new Path(r, versionDir(version) + ".claim")
    val target = new Path(r, versionDir(version))
    // the atomic version claim: create-exclusive either makes THIS
    // publisher the sole owner of `version` or throws because someone
    // else already owns it (dir present = already committed/staged)
    if (fs.exists(target))
      throw new ConcurrentPublishException(
        s"version $version under $root already exists")
    try fs.create(claim, false).close()
    catch {
      case e: java.io.IOException =>
        if (fs.exists(claim))
          throw new ConcurrentPublishException(
            s"version $version under $root is claimed by another publisher")
        else throw e // genuine FS failure, not a conflict
    }
    val stage = new Path(r, s".stage-${versionDir(version)}-${java.util.UUID.randomUUID()}")
    try {
      tables.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(new Path(stage, name).toString)
      }
      if (fs.exists(target) || !fs.rename(stage, target))
        throw new ConcurrentPublishException(
          s"snapshot publish lost the claim on $target despite holding $claim")
      // the commit: one atomic empty-file creation makes every table
      // of this version visible together
      fs.create(new Path(target, Marker), false).close()
      version
    } finally {
      fs.delete(stage, true) // failed-attempt debris; no-op after rename
      // release the claim: on success the committed `v=<n>` dir itself
      // holds the number; on a CAUGHT failure nothing was renamed, so
      // the number is genuinely free for the retry. Only a hard JVM
      // crash leaves a standing claim — which is exactly when the
      // number must stay blocked (the crashed writer may have a stage
      // mid-rename), until vacuum's age guard reaps it.
      fs.delete(claim, false)
    }
  }

  /** Publish `tables` (written in the given order) as one atomic
    * version; returns the version number. Concurrent publishers are
    * safe: each attempt claims the next free number atomically, and a
    * lost claim retries at the number AFTER the winner's (up to
    * `maxAttempts` — beyond that the contention is pathological and
    * the caller should hear about it).
    */
  def publish(spark: SparkSession, root: String,
      tables: Seq[(String, DataFrame)], maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1, "need at least one attempt")
    val (fs, r) = fsOf(spark, root)
    var lastConflict: ConcurrentPublishException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try return publishAt(spark, root, tables, nextVersion(fs, r))
      catch { case e: ConcurrentPublishException => lastConflict = e }
    }
    throw new ConcurrentPublishException(
      s"gave up after $maxAttempts contended attempts under $root " +
        s"(last: ${lastConflict.getMessage})")
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

  /** Drop old published versions and crash debris, with a RETENTION
    * GUARD: nothing younger than `minAgeMillis` is deleted, whatever
    * `keep` says. The guard is what makes vacuum safe to run beside
    * readers — `readAt` hands back a LAZY scan, and a version deleted
    * between plan and action turns into FileNotFound mid-query; with
    * the guard, any version a live reader could still be scanning is
    * left alone until it ages out (pass `minAgeMillis = 0` only when
    * the caller can prove no reader is in flight). The same age guard
    * covers unmarked version dirs, claim files and staging dirs:
    * young ones may be a CONCURRENT publisher mid-flight (the claim
    * protocol explicitly allows one), old ones are crash debris.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int,
      minAgeMillis: Long = DefaultRetentionMillis): Unit = {
    require(keep >= 1, "must keep at least the current version")
    require(minAgeMillis >= 0, "negative retention")
    val (fs, r) = fsOf(spark, root)
    val now = System.currentTimeMillis()
    def oldEnough(p: Path): Boolean =
      !fs.exists(p) || now - fs.getFileStatus(p).getModificationTime >= minAgeMillis
    val all = versions(fs, r)
    val published = all.collect { case (n, _, true) => n }.sorted
    val cutoff = published.takeRight(keep).headOption.getOrElse(return)
    all.foreach { case (n, p, marked) =>
      // a published version's age is its COMMIT time (the marker's),
      // not the dir's — the rename that creates the dir predates the
      // moment readers could first resolve it
      val age = if (marked) new Path(p, Marker) else p
      if ((!marked || n < cutoff) && oldEnough(age)) fs.delete(p, true)
    }
    claims(fs, r).foreach { case (n, p) =>
      // a claim whose version committed is spent; an uncommitted young
      // claim may be a publisher mid-write — age-guard it
      val committed = fs.exists(new Path(new Path(r, versionDir(n)), Marker))
      if (committed || oldEnough(p)) fs.delete(p, false)
    }
    if (fs.exists(r)) fs.listStatus(r).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith(".stage-") &&
          oldEnough(s.getPath))
        fs.delete(s.getPath, true)
    }
  }
}
