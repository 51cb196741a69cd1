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

  test("logical types: date + timestamp-micros round-trip, nulls and epoch edges survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    val rows = Seq(
      (1L, Some(java.sql.Date.valueOf("1970-01-01")),
        Some(java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))),
      (2L, Some(java.sql.Date.valueOf("1969-12-31")), // pre-epoch: negative days
        Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"))),
      (3L, None, None), // null through the ["null", logical] union
      (4L, Some(java.sql.Date.valueOf("2024-02-29")), // leap day
        Some(java.sql.Timestamp.valueOf("2024-02-29 12:34:56.123456"))))
    AvroZone.write(rows.toDF("id", "d", "ts").repartition(2), dir)
    val back = AvroZone.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("d", DateType), ("ts", TimestampType)),
      "logical-type annotations must survive the embedded writer schema")
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getDate(1)), Option(r.getTimestamp(2)))).toSeq
    assert(got == rows.map(t => (t._1, t._2, t._3)))
    // the wire values are spec-exact: epoch-days int / epoch-micros long
    val schemaJson = AvroZone.avroSchemaJson(back.schema)
    assert(schemaJson.contains(""""logicalType":"date""""))
    assert(schemaJson.contains(""""logicalType":"timestamp-micros""""))
  }

  test("a crashed attempt's staging orphan is invisible to the reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").toString + "/t"
    AvroZone.write(Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1), dir)
    // simulate a task that died between create and rename: the staged
    // file exists but was never published
    val orphan = new java.io.File(dir, "_tmp-part-9-99.staging")
    Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    assert(AvroZone.read(spark, dir).count() == 2,
      "orphaned staging files must not be read as containers")
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
