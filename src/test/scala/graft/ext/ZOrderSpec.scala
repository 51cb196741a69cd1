package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ZOrderSpec extends SparkSpec {

  test("zValue: bit interleaving matches the reference definition on hand cases") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (1023L, 1023L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 10))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def ref(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    got.foreach { case ((x, y), z) => assert(z == ref(x, y), s"($x,$y)") }
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((1L, 1L)) == 3L)
  }

  test("z-ordered layout: a narrow y-slice touches FEWER files than under an x-only sort") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val dims = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(
        (col("o_custkey") % 1024L).as("x"),
        (datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01")))
          .cast("long") % 1024L).as("y"))

    ZOrder.writeZOrdered(dims, ZOrder.zValue(col("x"), col("y"), 10), 16, s"$base/byz")
    // the single-column layout every naive pipeline ships: perfect
    // pruning on x, none on y
    dims.withColumn("_s", col("x"))
      .repartitionByRange(16, col("_s")).sortWithinPartitions("_s").drop("_s")
      .write.mode("overwrite").parquet(s"$base/byx")

    // files whose content overlaps the y-slice = files a stats-pruning
    // reader must open (parquet footers carry exactly these min/maxes)
    def filesTouched(path: String): (Long, Long) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("y_min"), max("y").as("y_max"))
      (perFile.filter(col("y_min") <= 131L && col("y_max") >= 100L).count(), perFile.count())
    }
    val (zTouched, zTotal) = filesTouched(s"$base/byz")
    val (xTouched, xTotal) = filesTouched(s"$base/byx")
    assert(zTotal >= 8 && xTotal >= 8, s"layouts produced $zTotal/$xTotal files")
    // x-sort: y values are uniform within every file -> the slice
    // touches (essentially) all of them; z-order: only the files whose
    // rectangle overlaps y in [100, 131]
    assert(xTouched >= xTotal - 1, s"x-sort unexpectedly pruned: $xTouched/$xTotal")
    assert(zTouched * 2 <= zTotal, s"z-order pruned too little: $zTouched/$zTotal")
  }
}
