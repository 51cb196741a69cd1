package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DeltaLog]] against hand-authored protocol-conformant logs: the
  * spec crafts `_delta_log` contents exactly as the published Delta
  * protocol lays them out (20-digit JSON commits, one action per
  * line, classic checkpoint parquet + `_last_checkpoint`) and asserts
  * snapshot reconstruction — including the cases a naive directory
  * glob gets wrong (removes, re-adds, time travel) and the loud-fail
  * guards (unsupported reader features, partitioned tables, log
  * gaps).
  */
class DeltaLogSpec extends SparkSpec {

  private def newTable(): String =
    Files.createTempDirectory("graft-delta").toString

  /** Write `n` rows tagged `tag` as a single named data file. */
  private def dataFile(table: String, name: String, tag: String, n: Int): Unit = {
    import spark.implicits._
    val stage = s"$table/_stage"
    (0 until n).map(i => (tag, i.toLong)).toDF("tag", "i")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$stage/part-*.parquet"))(0).getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$table/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  private def commit(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(s"$table/_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n"))
  }

  private val Protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private val Meta =
    """{"metaData":{"id":"t","format":{"provider":"parquet"},"schemaString":"{}","partitionColumns":[]}}"""
  private def add(p: String) =
    s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
  private def remove(p: String) =
    s"""{"remove":{"path":"$p","deletionTimestamp":1,"dataChange":true}}"""

  private def tagCounts(table: String, v: Option[Long] = None): Set[(String, Long)] = {
    val df = DeltaLog.read(spark, table, v)
    df.groupBy("tag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[Long]("n")).toSet
  }

  test("action replay: removes drop a file still on disk; later re-add restores it") {
    val t = newTable()
    dataFile(t, "a.parquet", "a", 3)
    dataFile(t, "b.parquet", "b", 4)
    commit(t, 0, Seq(Protocol, Meta, add("a.parquet"), add("b.parquet")))
    commit(t, 1, Seq(remove("b.parquet")))
    // b.parquet is STILL ON DISK — the log, not the directory, is truth
    assert(tagCounts(t) == Set("a" -> 3L))
    commit(t, 2, Seq(add("b.parquet"))) // re-add: last action per path wins
    assert(tagCounts(t) == Set("a" -> 3L, "b" -> 4L))
  }

  test("time travel: versionAsOf replays only the prefix of the log") {
    val t = newTable()
    dataFile(t, "a.parquet", "a", 2)
    dataFile(t, "b.parquet", "b", 2)
    commit(t, 0, Seq(Protocol, Meta, add("a.parquet")))
    commit(t, 1, Seq(remove("a.parquet"), add("b.parquet")))
    assert(tagCounts(t, Some(0L)) == Set("a" -> 2L))
    assert(tagCounts(t, Some(1L)) == Set("b" -> 2L))
    assert(tagCounts(t) == Set("b" -> 2L))
  }

  test("checkpoint: snapshot resumes from the checkpoint parquet plus later commits") {
    import spark.implicits._
    val t = newTable()
    dataFile(t, "a.parquet", "a", 2)
    dataFile(t, "b.parquet", "b", 3)
    dataFile(t, "c.parquet", "c", 5)
    // versions 0-1 are COMPACTED AWAY: only the checkpoint at v1 and
    // the v2 commit exist (the post-cleanup shape of a real table)
    val cpState = Seq(("a.parquet", true), ("b.parquet", true)).toDF("p", "isAdd")
      .select(
        when(col("isAdd"), struct(col("p").as("path"), lit(1L).as("size"),
          lit(true).as("dataChange"))).as("add"),
        when(!col("isAdd"), struct(col("p").as("path"),
          lit(1L).as("deletionTimestamp"))).as("remove"))
    cpState.coalesce(1).write.parquet(s"$t/_cpstage")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$t/_cpstage/part-*.parquet"))(0).getPath
    Files.createDirectories(Paths.get(s"$t/_delta_log"))
    fs.rename(part, new org.apache.hadoop.fs.Path(
      s"$t/_delta_log/" + f"${1L}%020d" + ".checkpoint.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$t/_cpstage"), true)
    Files.writeString(Paths.get(s"$t/_delta_log/_last_checkpoint"),
      """{"version":1,"size":2}""")
    commit(t, 2, Seq(remove("b.parquet"), add("c.parquet")))
    assert(tagCounts(t) == Set("a" -> 2L, "c" -> 5L))
  }

  test("append writer: round trip, contiguous versions, time travel, conflict retry") {
    import spark.implicits._
    val t = newTable()
    val v0 = DeltaLog.append(spark, t,
      Seq(("a", 1L), ("a", 2L)).toDF("tag", "i"))
    assert(v0 == 0L)
    // a concurrent writer takes version 1 (commitInfo-only commit is
    // protocol-legal) — the next append must RETRY past it, not
    // overwrite it
    commit(t, 1, Seq("""{"commitInfo":{"operation":"OPTIMIZE"}}"""))
    val v2 = DeltaLog.append(spark, t, Seq(("b", 3L)).toDF("tag", "i"))
    assert(v2 == 2L, s"conflict retry should land at version 2, got $v2")
    assert(tagCounts(t) == Set("a" -> 2L, "b" -> 1L))
    // time travel cuts back to the first append
    assert(tagCounts(t, Some(0L)) == Set("a" -> 2L))
    // and version numbering on disk is exactly 0, 1, 2
    val names = new java.io.File(s"$t/_delta_log").list().toSeq
      .filter(_.endsWith(".json")).sorted
    assert(names == Seq(f"${0L}%020d.json", f"${1L}%020d.json", f"${2L}%020d.json"), names)
  }

  test("guards: unsupported reader version, partitioned table, log gap, no live files") {
    val t1 = newTable()
    dataFile(t1, "a.parquet", "a", 1)
    commit(t1, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      Meta, add("a.parquet")))
    val e1 = intercept[IllegalArgumentException](DeltaLog.read(spark, t1))
    assert(e1.getMessage.contains("minReaderVersion"), e1.getMessage)

    val t2 = newTable()
    dataFile(t2, "a.parquet", "a", 1)
    commit(t2, 0, Seq(Protocol,
      """{"metaData":{"id":"t","format":{"provider":"parquet"},"schemaString":"{}","partitionColumns":["day"]}}""",
      add("a.parquet")))
    val e2 = intercept[IllegalArgumentException](DeltaLog.read(spark, t2))
    assert(e2.getMessage.contains("partitioned"), e2.getMessage)

    val t3 = newTable()
    dataFile(t3, "a.parquet", "a", 1)
    commit(t3, 0, Seq(Protocol, Meta, add("a.parquet")))
    commit(t3, 2, Seq(add("a.parquet"))) // version 1 missing
    val e3 = intercept[IllegalArgumentException](DeltaLog.read(spark, t3))
    assert(e3.getMessage.contains("missing"), e3.getMessage)

    val t4 = newTable()
    dataFile(t4, "a.parquet", "a", 1)
    commit(t4, 0, Seq(Protocol, Meta, add("a.parquet")))
    commit(t4, 1, Seq(remove("a.parquet")))
    val e4 = intercept[IllegalArgumentException](DeltaLog.read(spark, t4))
    assert(e4.getMessage.contains("no live data files"), e4.getMessage)
  }
}
