package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[AvroZone]] — container round trip without the spark-avro jar:
  * multi-partition write (one container per partition), null handling
  * through the `["null", T]` unions, embedded-writer-schema reads, and
  * the loud type guards.
  */
class AvroZoneSpec extends SparkSpec {

  test("round trip: multi-partition write, embedded-schema read, nulls survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    val df = Seq(
      (1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("c"), 3.5), (4L, Some("d"), 4.5))
      .toDF("id", "tag", "v").repartition(3)
    AvroZone.write(df, dir)
    val files = new java.io.File(dir).list().toSeq.filter(_.endsWith(".avro"))
    assert(files.nonEmpty && files.size <= 3, s"one container per non-empty partition: $files")
    val back = AvroZone.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("tag", StringType), ("v", DoubleType)))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(rows == Seq(
      (1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("c"), 3.5), (4L, Some("d"), 4.5)))
  }

  test("guards: unsupported column type on write; empty dir on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString
    val e1 = intercept[IllegalArgumentException](
      AvroZone.write(Seq((1L, Seq("x"))).toDF("id", "arr"), s"$dir/bad"))
    assert(e1.getMessage.contains("unsupported column type"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](AvroZone.read(spark, s"$dir/empty"))
    assert(e2.getMessage.contains("no .avro containers"), e2.getMessage)
  }

  test("an empty frame round-trips: one empty container carries the schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    AvroZone.write(Seq.empty[(Long, String)].toDF("id", "tag"), dir)
    val back = AvroZone.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(back.count() == 0)
  }

  test("filters and projections compose on the read frame") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    AvroZone.write((1L to 100L).map(i => (i, s"t$i", i * 1.0)).toDF("id", "tag", "v"), dir)
    val got = AvroZone.read(spark, dir).filter(col("id") % 10 === 0)
      .agg(sum("v").cast("long").as("s")).head().getLong(0)
    assert(got == (10L to 100L by 10).sum)
  }
}
