package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Iceberg FORMAT-VERSION 3 deletion vectors: the [[Puffin]] blob
  * format (writer-twin round-trip — the repo's codec verification
  * contract) and [[IcebergTable.deleteRowsDv]] end to end: upgrade to
  * v3, per-file roaring blobs, re-delete union under the
  * at-most-one-DV-per-file invariant, coexistence with equality
  * deletes, time travel, and the loud-fail guards.
  */
class IcebergV3DvSpec extends SparkSpec {

  private def newTable(): String =
    Files.createTempDirectory("graft-iceberg-v3").toString

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("roaring64 portable round-trip: sparse keys, bitset containers, empties") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Long]] = Seq(
      Array.empty[Long],
      Array(0L),
      Array(0L, 1L, 65535L, 65536L, 1000000L),
      // > 4096 per container forces the bitset encoding
      (0L until 6000L).map(_ * 2).toArray,
      // sparse HIGH keys — the keyed form never materializes the gap
      Array(5L, (3L << 32) | 7L, (3L << 32) | 8L, (900L << 32) | 1L),
      Array.fill(5000)(math.abs(rnd.nextLong()) % (1L << 40)))
    cases.foreach { ps =>
      val expect = ps.distinct.sorted
      assert(Puffin.deserialize64(Puffin.serialize64(ps)).toSeq == expect.toSeq)
    }
  }

  test("puffin file: blobs round-trip through manifest-style offsets and the footer") {
    val dir = Files.createTempDirectory("graft-puffin").toString
    val target = new Path(dir, "dv.puffin")
    val a = Array(1L, 5L, 9L)
    val b = (0L until 5000L).toArray
    val blobs = Puffin.writeDvFile(fs, target,
      Seq(("file:/data/a.parquet", a), ("file:/data/b.parquet", b)), 77L, 3L)
    assert(blobs.map(_.referencedDataFile) ==
      Seq("file:/data/a.parquet", "file:/data/b.parquet"))
    assert(blobs.map(_.cardinality) == Seq(3L, 5000L))
    blobs.zip(Seq(a, b)).foreach { case (blob, expect) =>
      assert(Puffin.readDv(fs, target, blob.offset, blob.length).toSeq == expect.toSeq)
    }
    // the footer lists the same blobs (self-describing fallback)
    assert(Puffin.listBlobs(fs, target) == blobs)
    // flipping one vector byte trips the CRC, loudly
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "dv.puffin"))
    bytes(blobs.head.offset.toInt + 9) = (bytes(blobs.head.offset.toInt + 9) ^ 0x40).toByte
    val corrupt = new Path(dir, "corrupt.puffin")
    val out = fs.create(corrupt, false)
    try out.write(bytes) finally out.close()
    assert(intercept[IllegalArgumentException](
      Puffin.readDv(fs, corrupt, blobs.head.offset, blobs.head.length))
      .getMessage.contains("CRC"))
  }

  test("deleteRowsDv: v3 upgrade, per-file vectors, re-delete union, time travel") {
    import spark.implicits._
    val t = newTable()
    val df1 = (0 until 40).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
      .coalesce(1).sortWithinPartitions("id")
    val df2 = (40 until 80).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
      .coalesce(1).sortWithinPartitions("id")
    IcebergTable.append(spark, t, df1)
    val preDelete = IcebergTable.append(spark, t, df2)
    val s1 = IcebergTable.deleteRowsDv(spark, t, col("id") % 7 === 3)
    assert(s1 >= 0)
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.formatVersion == 3)
    val dvs = snap.deleteFiles.filter(_.isDv)
    // both data files had id%7==3 rows -> one DV each, one puffin file
    assert(dvs.size == 2 && dvs.map(_.path).distinct.size == 1)
    assert(dvs.forall(_.path.endsWith(".puffin")))
    val got1 = IcebergTable.read(spark, t).select("id").as[Long].collect().toSet
    assert(got1 == (0L until 80L).filterNot(_ % 7 == 3).toSet)
    // RE-DELETE: new vectors must union and replace (still one DV/file)
    val s2 = IcebergTable.deleteRowsDv(spark, t, col("id") % 11 === 5)
    assert(s2 >= 0)
    val snap2 = IcebergTable.snapshot(spark, t)
    assert(snap2.deleteFiles.count(_.isDv) == 2)
    val got2 = IcebergTable.read(spark, t).select("id").as[Long].collect().toSet
    assert(got2 == (0L until 80L).filterNot(i => i % 7 == 3 || i % 11 == 5).toSet)
    // cardinality reflects the UNION, not just the new tombstones
    assert(snap2.deleteFiles.filter(_.isDv).map(_.records).sum ==
      (0L until 80L).count(i => i % 7 == 3 || i % 11 == 5))
    // time travel to the pre-delete snapshot sees every row
    assert(IcebergTable.read(spark, t, Some(preDelete)).count() == 80)
    // a DV delete matching nothing live is a no-op
    assert(IcebergTable.deleteRowsDv(spark, t, col("id") % 7 === 3) == -1L)
    // appends keep working on the v3 table; new rows are untouched
    IcebergTable.append(spark, t,
      Seq((100L, "new")).toDF("id", "tag").coalesce(1))
    assert(IcebergTable.read(spark, t).count() == got2.size + 1)
  }

  test("deleteRowsDv respects partitions and coexists with equality deletes") {
    import spark.implicits._
    val t = newTable()
    val base = (0 until 60).map(i => (i.toLong, (i % 3).toString)).toDF("id", "p")
    IcebergTable.append(spark, t, base.repartition(2), partitionBy = Seq("p"))
    assert(IcebergTable.deleteRowsDv(spark, t, col("id") < 10) >= 0)
    // equality delete layered AFTER the v3 upgrade still applies
    IcebergTable.deleteRowsEquality(spark, t, Seq("id"),
      Seq(20L, 21L).toDF("id"))
    val got = IcebergTable.read(spark, t).select("id").as[Long].collect().toSet
    assert(got == (0L until 60L).filterNot(i => i < 10 || i == 20 || i == 21).toSet)
    // each DV entry carries its referenced file's partition tuple
    val snap = IcebergTable.snapshot(spark, t)
    assert(snap.deleteFiles.filter(_.isDv).forall(_.partition.keySet == Set("p")))
  }

  test("guards: deleteRows refuses on v3; deleteRowsDv refuses over parquet position deletes") {
    import spark.implicits._
    val t = newTable()
    IcebergTable.append(spark, t, (0 until 20).map(i => (i.toLong, "x")).toDF("id", "tag"))
    IcebergTable.deleteRowsDv(spark, t, col("id") === 0L)
    assert(intercept[IllegalArgumentException](
      IcebergTable.deleteRows(spark, t, col("id") === 1L))
      .getMessage.contains("deleteRowsDv"))
    val t2 = newTable()
    IcebergTable.append(spark, t2, (0 until 20).map(i => (i.toLong, "x")).toDF("id", "tag"))
    IcebergTable.deleteRows(spark, t2, col("id") === 0L) // v2 parquet tombstones
    assert(intercept[IllegalArgumentException](
      IcebergTable.deleteRowsDv(spark, t2, col("id") === 1L))
      .getMessage.contains("rewriteDataFiles"))
    // format-version 4 refuses loudly
    val t3 = newTable()
    IcebergTable.append(spark, t3, Seq((1L, "x")).toDF("id", "tag"))
    val metaDir = new Path(t3, "metadata")
    val v1 = new Path(metaDir, "v1.metadata.json")
    val txt = {
      val in = fs.open(v1)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val out = fs.create(new Path(metaDir, "v2.metadata.json"), false)
    try out.write(txt.replace("\"format-version\" : 1", "\"format-version\" : 4")
      .getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write("2".getBytes("UTF-8")) finally hint.close()
    assert(intercept[IllegalArgumentException](IcebergTable.read(spark, t3))
      .getMessage.contains("format-version 4"))
  }

  test("rewriteDataFiles purges deletion vectors: tombstoned files compact clean") {
    import spark.implicits._
    val t = newTable()
    IcebergTable.append(spark, t,
      (0 until 30).map(i => (i.toLong, "a")).toDF("id", "tag").coalesce(1))
    IcebergTable.append(spark, t,
      (30 until 60).map(i => (i.toLong, "a")).toDF("id", "tag").coalesce(1))
    IcebergTable.deleteRowsDv(spark, t, col("id") % 5 === 0)
    val before = IcebergTable.read(spark, t).select("id").as[Long].collect().toSet
    assert(IcebergTable.rewriteDataFiles(spark, t) >= 0)
    val snap = IcebergTable.snapshot(spark, t)
    // the rewrite read through the DVs — dead rows never resurrect
    assert(IcebergTable.read(spark, t).select("id").as[Long].collect().toSet == before)
    assert(before == (0L until 60L).filterNot(_ % 5 == 0).toSet)
  }
}
