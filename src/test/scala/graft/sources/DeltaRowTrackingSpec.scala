package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WRITE side of Delta row tracking (delta.io PROTOCOL.md,
  * "Row Tracking"): [[DeltaLog.append]] allocates each new file a
  * contiguous block of fresh row ids above the `delta.rowTracking`
  * domain-metadata high-water mark, and [[DeltaLog.compact]] carries
  * survivor identities through its dataChange=false rewrite via the
  * MATERIALIZED row-id columns — so a CDC consumer keying on `row_id`
  * sees stable identities across appends, maintenance, checkpoints,
  * and crash/replay.
  */
class DeltaRowTrackingSpec extends SparkSpec {

  private def newTable(): String =
    Files.createTempDirectory("graft-rowtrack").toString

  private def df(tag: String, from: Int, n: Int) = {
    import spark.implicits._
    (from until from + n).map(i => (i.toLong, tag)).toDF("id", "tag")
      .coalesce(1).sortWithinPartitions("id")
  }

  private def idsOf(table: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    DeltaLog.readWithRowIds(spark, table)
      .select("id", "row_id", "row_commit_version")
      .as[(Long, Long, Long)].collect()
      .map { case (k, rid, rcv) => k -> (rid, rcv) }.toMap
  }

  test("append allocates monotonic base row ids and advances the high-water mark") {
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 10), rowTracking = true)
    DeltaLog.append(spark, t, df("b", 100, 5))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.writerFeatures.contains("rowTracking"))
    assert(snap.writerFeatures.contains("domainMetadata"))
    assert(snap.rowIdHighWaterMark.contains(14L))
    assert(snap.files.forall(f => f.baseRowId.isDefined && f.defaultRowCommitVersion.isDefined))
    val ids = idsOf(t)
    assert(ids.size == 15)
    // single sorted file per append: row id == hwm-ordered rank
    assert((0 until 10).map(i => ids(i.toLong)._1) == (0L until 10L))
    assert((100 until 105).map(i => ids(i.toLong)._1) == (10L until 15L))
    // commit version: creation commit 0, second append commit 1
    assert(ids(0L)._2 == 0L && ids(104L)._2 == 1L)
  }

  test("compact preserves survivor ids via materialized columns; fresh appends continue above") {
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 8), rowTracking = true)
    DeltaLog.append(spark, t, df("b", 8, 8))
    val before = idsOf(t)
    val v = DeltaLog.compact(spark, t)
    assert(v >= 0, "compaction should have packed the two small files")
    val snapAfter = DeltaLog.snapshot(spark, t)
    // the rewrite landed ONE file carrying a fresh base, and the mark
    // moved past it (ids burn even for dataChange=false adds)
    assert(snapAfter.files.size == 1)
    assert(snapAfter.rowIdHighWaterMark.exists(_ >= 16L))
    val after = idsOf(t)
    assert(after == before, "compaction must not renumber a single survivor")
    // a post-compaction append takes ids ABOVE the compacted file's
    // burned block — never reusing, never colliding
    DeltaLog.append(spark, t, df("c", 100, 4))
    val ids = idsOf(t)
    assert(ids.size == 20)
    val freshIds = (100 until 104).map(i => ids(i.toLong)._1)
    assert(freshIds.toSet.intersect(before.values.map(_._1).toSet).isEmpty)
    assert(freshIds == freshIds.sorted && freshIds.head > 15L)
    // survivors STILL unchanged after the later append
    assert(before.forall { case (k, v2) => ids(k) == v2 })
  }

  test("partitioned row-tracking table: per-partition compaction keeps every identity") {
    import spark.implicits._
    val base = (0 until 30).map(i => (i.toLong, (i % 3).toString)).toDF("id", "p")
    DeltaLog.append(spark, newTableVar, base.repartition(2), partitionBy = Seq("p"),
      rowTracking = true)
    DeltaLog.append(spark, newTableVar,
      (30 until 60).map(i => (i.toLong, (i % 3).toString)).toDF("id", "p").repartition(2),
      partitionBy = Seq("p"))
    val before = idsOf(newTableVar)
    assert(before.size == 60)
    assert(before.values.map(_._1).toSeq.distinct.size == 60, "row ids must be unique")
    assert(DeltaLog.compact(spark, newTableVar) >= 0)
    assert(idsOf(newTableVar) == before)
  }
  private val newTableVar = newTable()

  test("ids survive checkpointing: domain metadata and base ids ride the checkpoint") {
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 6), rowTracking = true)
    DeltaLog.append(spark, t, df("b", 6, 6))
    val before = idsOf(t)
    DeltaLog.writeCheckpoint(spark, t)
    // drop the JSON prefix — the checkpoint is now the only witness
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(0L, 1L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(f"$t/_delta_log/$v%020d.json"), false)
    }
    assert(idsOf(t) == before, "checkpoint must carry baseRowId/defaultRowCommitVersion")
    // and the high-water mark survived too: the next append continues
    // above 11 instead of re-allocating from scratch
    DeltaLog.append(spark, t, df("c", 100, 3))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.rowIdHighWaterMark.contains(14L))
    val ids = idsOf(t)
    assert((100 until 103).map(i => ids(i.toLong)._1) == (12L until 15L))
  }

  test("crash replay: staged-but-uncommitted files burn nothing; txn replay burns once") {
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 5), rowTracking = true,
      txn = Some(("app", 1L)))
    // a crashed append dies AFTER moving data files but BEFORE its
    // commit lands — simulate the orphan it leaves behind
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    df("orphan", 900, 7).write.parquet(s"$t/_crash_stage")
    val part = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$t/_crash_stage/part-*.parquet"))(0).getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$t/part-crashed-orphan.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$t/_crash_stage"), true)
    // ids allocate at COMMIT time, so the orphan burned nothing
    assert(DeltaLog.snapshot(spark, t).rowIdHighWaterMark.contains(4L))
    // the RETRY of epoch 1 (exactly-once txn) is a no-op: no rows, no burn
    assert(DeltaLog.append(spark, t, df("a", 0, 5), txn = Some(("app", 1L))) == -1L)
    assert(DeltaLog.snapshot(spark, t).rowIdHighWaterMark.contains(4L))
    // the NEXT epoch allocates contiguously — the crash left no gap
    DeltaLog.append(spark, t, df("b", 10, 5), txn = Some(("app", 2L)))
    val ids = idsOf(t)
    assert(ids.size == 10)
    assert((10 until 15).map(i => ids(i.toLong)._1) == (5L until 10L))
  }

  test("identity columns: generated values respect start/step and advance the field-metadata mark") {
    import spark.implicits._
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 5), identity = Some(("sk", 100L, 3L)))
    DeltaLog.append(spark, t, df("b", 10, 4))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.writerFeatures.contains("identityColumns"))
    val f = snap.schema.get("sk")
    assert(f.metadata.getLong("delta.identity.start") == 100L)
    assert(f.metadata.getLong("delta.identity.step") == 3L)
    assert(f.metadata.getLong("delta.identity.highWaterMark") == 100L + 3L * 8)
    val got = DeltaLog.read(spark, t).select("id", "sk")
      .as[(Long, Long)].collect().toMap
    // single sorted file per append: sk follows key rank within each
    assert((0 until 5).map(i => got(i.toLong)) == (0 until 5).map(i => 100L + 3L * i))
    assert((10 until 14).map(i => got(i.toLong)) == (0 until 4).map(i => 115L + 3L * i))
    // compaction is a pure rewrite: identity values are data and survive
    assert(DeltaLog.compact(spark, t) >= 0)
    assert(DeltaLog.read(spark, t).select("id", "sk")
      .as[(Long, Long)].collect().toMap == got)
    // the mark did NOT move on compact
    assert(DeltaLog.snapshot(spark, t).schema.get("sk")
      .metadata.getLong("delta.identity.highWaterMark") == 124L)
  }

  test("identity columns: negative step descends; guards refuse the unsupported shapes") {
    import spark.implicits._
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 3), identity = Some(("sk", -10L, -5L)))
    val got = DeltaLog.read(spark, t).select("id", "sk").as[(Long, Long)].collect().toMap
    assert((0 until 3).map(i => got(i.toLong)) == Seq(-10L, -15L, -20L))
    // explicit values refuse (generated-only subset)
    assert(intercept[IllegalArgumentException](
      DeltaLog.append(spark, t,
        Seq((99L, "x", 1L)).toDF("id", "tag", "sk")))
      .getMessage.contains("generated-only"))
    // row-removing writes refuse while an identity column is active
    assert(intercept[IllegalArgumentException](
      DeltaLog.delete(spark, t, col("id") === 0L))
      .getMessage.contains("identity"))
    // identity is a creation option; step 0 refuses
    val t2 = newTable()
    DeltaLog.append(spark, t2, df("a", 0, 3))
    assert(intercept[IllegalArgumentException](
      DeltaLog.append(spark, t2, df("b", 3, 3), identity = Some(("sk", 1L, 1L))))
      .getMessage.contains("CREATION option"))
    assert(intercept[IllegalArgumentException](
      DeltaLog.append(spark, newTable(), df("a", 0, 3), identity = Some(("sk", 1L, 0L))))
      .getMessage.contains("non-zero"))
  }

  test("guards: row-removing writes refuse; creation combos refuse; foreign half-config refuses") {
    import spark.implicits._
    val t = newTable()
    DeltaLog.append(spark, t, df("a", 0, 4), rowTracking = true)
    // delete/merge would renumber or drop identities — refused loudly
    val e1 = intercept[IllegalArgumentException](
      DeltaLog.delete(spark, t, col("id") === 1L))
    assert(e1.getMessage.contains("rowTracking"))
    // rowTracking is a creation option
    val t2 = newTable()
    DeltaLog.append(spark, t2, df("a", 0, 4))
    assert(intercept[IllegalArgumentException](
      DeltaLog.append(spark, t2, df("b", 4, 4), rowTracking = true))
      .getMessage.contains("CREATION option"))
    // column mapping + row tracking is out of scope, loudly
    assert(intercept[IllegalArgumentException](
      DeltaLog.append(spark, newTable(), df("a", 0, 4),
        columnMapping = "name", rowTracking = true))
      .getMessage.contains("not supported"))
    // a table declaring only ONE materialized column name is corrupt
    val t3 = newTable()
    DeltaLog.append(spark, t3, df("a", 0, 4), rowTracking = true)
    val logDir = f"$t3/_delta_log"
    val v1 = java.nio.file.Paths.get(logDir, f"${0L}%020d.json")
    val rewritten = new String(java.nio.file.Files.readAllBytes(v1), "UTF-8")
      .replaceAll(""""delta\.rowTracking\.materializedRowCommitVersionColumnName":"[^"]*",?""", "")
      .replace(",}", "}")
    java.nio.file.Files.write(v1, rewritten.getBytes("UTF-8"))
    // the out-of-band rewrite invalidates the local FS checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(logDir, f".${0L}%020d.json.crc"))
    assert(intercept[IllegalArgumentException](idsOf(t3))
      .getMessage.contains("half-configured"))
  }
}
