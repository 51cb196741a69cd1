package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class RawZoneSpec extends SparkSpec {

  private def tmpDir() = Files.createTempDirectory("rawzone").toString

  test("csvAllString: header row consumed, every column lands as string") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "location,date,new_cases\nSpain,2021-03-01,5000\nFrance,2021-03-01,\n")
    val df = RawZone.csvAllString(spark, s"$dir/data.csv")
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.count() == 2)
    // empty CSV field -> NULL (the pipeline's na.fill target)
    assert(df.filter(col("new_cases").isNull).count() == 1)
  }

  test("csv with declared schema: no inference pass, typed columns") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "k,v\n1,2.5\n2,3.5\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val df = RawZone.csv(spark, s"$dir/data.csv", schema)
    assert(df.schema == schema)
    assert(df.agg(sum("v")).collect().head.getDouble(0) == 6.0)
  }

  test("fetchToRaw: streams a URL into the raw zone, skips when present") {
    val dir = tmpDir()
    val src = java.nio.file.Path.of(dir, "remote.csv")
    Files.writeString(src, "a,b\n1,2\n")
    val raw = s"$dir/raw"
    // file:// URL exercises the same URL-stream path http(s) uses
    val fetched = RawZone.fetchToRaw(spark, src.toUri.toString, raw, "owid.csv")
    assert(fetched)
    assert(Files.readString(java.nio.file.Path.of(raw, "owid.csv")) == "a,b\n1,2\n")
    // second fetch: skip-if-exists (the reference's wget guard)
    assert(!RawZone.fetchToRaw(spark, src.toUri.toString, raw, "owid.csv"))
  }

  test("jsonl with declared schema: typed docs; malformed lines become all-NULL rows") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Path.of(dir, "docs.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "hola", "lang": "es"}
        |this line is not json
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = RawZone.jsonl(spark, s"$dir/docs.jsonl", schema)
    assert(df.schema == schema)
    assert(df.count() == 3)
    assert(df.filter(col("doc_id").isNotNull).count() == 2) // bad line -> NULL row, job survives
    assert(df.filter(col("doc_id") === 1).select("text").collect().head.getString(0) == "hello world")
  }

  test("archiveAndRotate: dated archive copy + last/ snapshot move") {
    val root = tmpDir()
    val incoming = s"$root/incoming"
    Files.createDirectories(java.nio.file.Path.of(incoming))
    Files.writeString(java.nio.file.Path.of(incoming, "a.csv"), "x\n1\n")
    RawZone.archiveAndRotate(spark, incoming, s"$root/raw", java.time.LocalDate.parse("2021-03-02"))
    assert(Files.exists(java.nio.file.Path.of(s"$root/raw/archived/2021/03/02/a.csv")))
    assert(Files.exists(java.nio.file.Path.of(s"$root/raw/last/a.csv")))
    assert(!Files.exists(java.nio.file.Path.of(s"$incoming/a.csv"))) // moved
  }

  test("writePartitioned + overwrite: hive layout, partition pruning, one file per partition") {
    import spark.implicits._
    val dir = tmpDir() + "/curated"
    val df = Seq((1, 2021, "03", 10.0), (2, 2021, "04", 20.0), (3, 2022, "01", 30.0))
      .toDF("id", "Year", "Month", "v")
    RawZone.overwritePartitioned(df, dir, Seq("Year", "Month"))
    assert(Files.exists(java.nio.file.Path.of(s"$dir/Year=2021/Month=03")))
    // one data file per partition (the scale-correct coalesce(1) twin)
    val files = new java.io.File(s"$dir/Year=2021/Month=03")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partition filter prunes directories, not just rows
    val pruned = back.filter(col("Year") === 2021 && col("Month") === "03")
    assert(pruned.count() == 1)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    RawZone.overwritePartitioned(df.filter(col("Year") === 2022), dir, Seq("Year", "Month"))
    assert(spark.read.parquet(dir).count() == 1) // S10 wipe semantics
  }

  test("stagedUpsertSql mirrors the reference postActions statement set") {
    val sql = RawZone.stagedUpsertSql("MetricsCovid_Fact_tmp", "MetricsCovid_Fact",
      Seq("Date", "CodeISO"), Some("_TF_LAST_UPDATE"))
    assert(sql == Seq(
      "delete from MetricsCovid_Fact where exists (select 1 from MetricsCovid_Fact_tmp where " +
        "MetricsCovid_Fact_tmp.Date = MetricsCovid_Fact.Date and " +
        "MetricsCovid_Fact_tmp.CodeISO = MetricsCovid_Fact.CodeISO and " +
        "MetricsCovid_Fact_tmp._TF_LAST_UPDATE >= MetricsCovid_Fact._TF_LAST_UPDATE);",
      "delete from MetricsCovid_Fact_tmp where exists (select 1 from MetricsCovid_Fact where " +
        "MetricsCovid_Fact.Date = MetricsCovid_Fact_tmp.Date and " +
        "MetricsCovid_Fact.CodeISO = MetricsCovid_Fact_tmp.CodeISO and " +
        "MetricsCovid_Fact._TF_LAST_UPDATE > MetricsCovid_Fact_tmp._TF_LAST_UPDATE);",
      "insert into MetricsCovid_Fact select * from MetricsCovid_Fact_tmp;"))
    // key-only fallback: no delta predicate, staging always wins
    val keyOnly = RawZone.stagedUpsertSql("stg", "tgt", Seq("k"), None)
    assert(keyOnly.head == "delete from tgt where exists (select 1 from stg where stg.k = tgt.k);")
  }

  test("jdbcStagedWriteOptions: Synapse-shaped warehouse options (load_functions.py:53-60)") {
    val post = Seq("delete from t;", "insert into t select * from s;")
    // plain-JDBC shape: exactly the three options a generic target
    // accepts — no warehouse extras leaking in as connection properties
    assert(RawZone.jdbcStagedWriteOptions("jdbc:u", "STG", post) == Map(
      "url" -> "jdbc:u", "dbtable" -> "STG",
      "postActions" -> "delete from t;insert into t select * from s;"))
    // full MPP shape: maxStrLength + HASH distribution, drop-in for a
    // Synapse-style connector
    assert(RawZone.jdbcStagedWriteOptions("jdbc:u", "STG", post,
      maxStrLength = Some(4000), distributionColumn = Some("CodeISO")) == Map(
      "url" -> "jdbc:u", "dbtable" -> "STG",
      "postActions" -> "delete from t;insert into t select * from s;",
      "maxStrLength" -> "4000",
      "tableOptions" -> "CLUSTERED COLUMNSTORE INDEX, DISTRIBUTION = HASH (CodeISO)"))
    // no distribution column but table options requested -> ROUND_ROBIN
    assert(RawZone.jdbcStagedWriteOptions("jdbc:u", "STG", post,
      withTableOptions = true)("tableOptions")
      == "CLUSTERED COLUMNSTORE INDEX, DISTRIBUTION = ROUND_ROBIN")
  }

  test("compactInPlace: 50-file storm collapses to <= target files, rows and values intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(50).write.mode("overwrite").parquet(dir)
    def partFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles() == 50, s"expected the small-file storm, got ${partFiles()}")
    RawZone.compactInPlace(spark, dir, targetFiles = 4)
    assert(partFiles() <= 4, s"compaction left ${partFiles()} files")
    // no leftover swap directories
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName).toSet
    assert(!parent.exists(_.contains("compact-")), parent.toString)
    // content identical (keys dense, values aligned)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 1000 && back.head == ((1L, "v1")) && back.last == ((1000L, "v1000")))
  }

  test("compactInPlace: the rewrite is coalesce-shaped — no exchange in the compaction job") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    (1L to 100L).toDF("k").repartition(10).write.mode("overwrite").parquet(dir)
    // the ACTUAL pipeline compactInPlace writes from (factored out for
    // exactly this guard): an IO rebin, not a shuffle — a repartition
    // would push the whole table through an exchange for nothing
    val p = RawZone.compactionPlan(spark, dir, 4).queryExecution.executedPlan.toString
    assert(p.contains("Coalesce"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("overwriteDynamicPartitions: replaces only the touched partition, others' files untouched") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    val base = Seq((1L, "F", 10.0), (2L, "O", 20.0), (3L, "P", 30.0), (4L, "F", 40.0))
      .toDF("k", "status", "v")
    RawZone.overwritePartitioned(base, dir, Seq("status"))
    def files(status: String) = new java.io.File(s"$dir/status=$status").listFiles()
      .filter(_.getName.startsWith("part-")).map(f => (f.getName, f.lastModified)).toSet
    val oBefore = files("O")
    val pBefore = files("P")
    // restate F only
    RawZone.overwriteDynamicPartitions(
      Seq((1L, "F", 11.0), (4L, "F", 44.0)).toDF("k", "status", "v"), dir, Seq("status"))
    // untouched partitions keep the SAME physical files (names + mtimes)
    assert(files("O") == oBefore && files("P") == pBefore)
    val back = spark.read.parquet(dir)
      .select("k", "v").as[(Long, Double)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0), (4L, 44.0)))
    // and the session default stays static: a later plain overwrite still replaces the table
    RawZone.overwritePartitioned(Seq((9L, "O", 90.0)).toDF("k", "status", "v"), dir, Seq("status"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("incrementalCsvRead: full lifecycle — first run, commit, no-op run, late file") {
    val root = tmpDir()
    val landing = s"$root/landing"
    val manifest = s"$root/manifest"
    new java.io.File(landing).mkdirs()
    def drop(name: String, rows: String): Unit =
      Files.writeString(java.nio.file.Path.of(landing, name), s"k,v\n$rows")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def read() = RawZone.incrementalCsvRead(spark, landing, manifest, schema)

    // first run: no manifest yet -> everything is new, provenance attached
    drop("d1.csv", "1,a\n2,b\n")
    drop("d2.csv", "3,c\n")
    val r1 = read().orderBy("k").collect()
    assert(r1.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "d1.csv"), (2L, "d1.csv"), (3L, "d2.csv")))

    // commit, then a no-op daily run: empty frame, schema intact
    RawZone.commitProcessed(spark, manifest, Seq("d1.csv", "d2.csv"))
    val r2 = read()
    assert(r2.isEmpty && r2.columns.toSeq == Seq("k", "v", "src_file"))

    // a late third file: only its rows come back
    drop("d3.csv", "4,d\n")
    val r3 = read().collect()
    assert(r3.map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((4L, "d3.csv")))

    // the incremental scan must only OPEN the new file: the plan's
    // FileScan lists one path, not the whole landing dir
    val scanned = read().queryExecution.executedPlan.toString
    assert(scanned.contains("d3.csv") && !scanned.contains("d1.csv"), scanned)
  }

  test("incrementalCsvRead: crash/provisioning edges — partless manifest and missing landing") {
    val root = tmpDir()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))

    // landing zone not provisioned yet: the documented no-op daily
    // run, not a FileNotFoundException
    val r0 = RawZone.incrementalCsvRead(spark, s"$root/landing", s"$root/manifest", schema)
    assert(r0.isEmpty && r0.columns.toSeq == Seq("k", "v", "src_file"))

    // a commit job that crashed after mkdir leaves a manifest dir with
    // no parquet parts (only _temporary debris): must read as "nothing
    // committed", not brick later runs with schema inference
    new java.io.File(s"$root/manifest/_temporary").mkdirs()
    new java.io.File(s"$root/landing").mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$root/landing", "d1.csv"), "k,v\n1,a\n")
    assert(RawZone.processedFiles(spark, s"$root/manifest") == Set.empty[String])
    val r1 = RawZone.incrementalCsvRead(spark, s"$root/landing", s"$root/manifest", schema)
    assert(r1.count() == 1)

    // and a real commit into that same directory recovers the lifecycle
    RawZone.commitProcessed(spark, s"$root/manifest", Seq("d1.csv"))
    val r2 = RawZone.incrementalCsvRead(spark, s"$root/landing", s"$root/manifest", schema)
    assert(r2.isEmpty)
  }

  test("processedFiles: unexpected manifest layout raises instead of reading as empty") {
    val root = tmpDir()
    // a manifest dir holding VISIBLE non-parquet content is NOT the
    // crashed-commit signature — silently treating it as empty would
    // re-ingest every landing file; it must raise loudly
    new java.io.File(s"$root/manifest").mkdirs()
    Files.writeString(java.nio.file.Path.of(s"$root/manifest", "data.json"), "{}\n")
    val e = intercept[IllegalStateException] {
      RawZone.processedFiles(spark, s"$root/manifest")
    }
    assert(e.getMessage.contains("unexpected manifest layout"))
    // same for a visible SUBDIRECTORY (e.g. a future partitioned rewrite)
    val root2 = tmpDir()
    new java.io.File(s"$root2/manifest/day=1").mkdirs()
    intercept[IllegalStateException] {
      RawZone.processedFiles(spark, s"$root2/manifest")
    }
  }
}
