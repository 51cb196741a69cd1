package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro CONTAINER source/sink without the spark-avro connector (absent
  * from this Spark distribution's jars): the Object Container File
  * format is fully served by the avro-core/avro-mapred jars Spark DOES
  * ship, so both directions run as ordinary distributed jobs —
  *
  *  - WRITE: one container file per partition, each task encoding its
  *    rows with `DataFileWriter` straight to the target filesystem
  *    (task-attempt staging + rename, so speculative retries never
  *    publish half a file);
  *  - READ: the file list parallelizes into one task per container,
  *    each decoding with `DataFileReader` against the file's EMBEDDED
  *    writer schema — readers never guess; the declared Spark schema
  *    is derived from the first container's schema and every record is
  *    accessed by field name (schema-resolution friendly).
  *
  * Type scope (guarded loudly): the primitive set the testdata needs —
  * long, int, double, float, boolean, string — plus the two
  * spec-defined logical types the reference's Date-keyed fact table
  * needs (`date` as int/epoch-days, `timestamp-micros` as long);
  * nullable as `["null", T]` unions. Other nested/logical types
  * refuse.
  *
  * Scale shape: both directions are embarrassingly parallel over
  * files/partitions, no shuffle, no driver data path (only the FILE
  * LIST touches the driver — the same contract as every other source
  * here).
  */
object AvroZone {

  /** The Avro type token (a JSON fragment) for a Spark type: a quoted
    * primitive name, or a `{type, logicalType}` object for the two
    * supported logical types (Avro spec §Logical Types: `date` =
    * int/epoch-days, `timestamp-micros` = long/epoch-micros).
    */
  private def avroTypeJson(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
    case other => throw new IllegalArgumentException(
      s"AvroZone: unsupported column type ${other.simpleString}")
  }

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG =>
      if (s.getProp("logicalType") == "timestamp-micros") TimestampType else LongType
    case Schema.Type.INT =>
      if (s.getProp("logicalType") == "date") DateType else IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"AvroZone: unsupported union $s")
      sparkType(nonNull(0))
    case other => throw new IllegalArgumentException(
      s"AvroZone: unsupported Avro type $other")
  }

  /** JVM value → Avro wire value for one field (identity for
    * primitives; epoch-days int for Date, epoch-micros long for
    * Timestamp). Null-safe at the call site.
    */
  private def toAvroValue(dt: DataType): Any => Any = dt match {
    case DateType =>
      v => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case TimestampType =>
      v => {
        val ts = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      }
    case _ => identity
  }

  /** Avro wire value → JVM value for one field. Null-safe at the call
    * site.
    */
  private def fromAvroValue(dt: DataType): Any => Any = dt match {
    case DateType =>
      v => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
    case TimestampType =>
      v => {
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      }
    case StringType => {
      case u: org.apache.avro.util.Utf8 => u.toString
      case v => v
    }
    case _ => identity
  }

  /** The record schema JSON for a Spark schema (all fields nullable). */
  def avroSchemaJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroTypeJson(f.dataType)}],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"graft_row","fields":[$fields]}"""
  }

  /** Distributed write: each partition lands one container file. */
  def write(df: DataFrame, outDir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    val encoders: Array[Any => Any] = df.schema.fields.map(f => toAvroValue(f.dataType))
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = outDir
    new Path(out).getFileSystem(confSer.value).mkdirs(new Path(out))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val fs = new Path(out).getFileSystem(confSer.value)
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        // staged WITHOUT the .avro suffix: a crashed attempt's orphan
        // must never match the reader's part-*.avro glob
        val tmp = new Path(out, s"_tmp-part-$pid-$attempt.staging")
        val dest = new Path(out, f"part-$pid%05d.avro")
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        val os = fs.create(tmp, true)
        writer.create(schema, os)
        var n = 0L
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), if (row.isNullAt(i)) null else encoders(i)(row.get(i)))
            i += 1
          }
          writer.append(rec)
          n += 1
        }
        writer.close()
        // publish: task-attempt staging + rename (idempotent on retry)
        fs.delete(dest, false)
        require(fs.rename(tmp, dest), s"AvroZone: publish failed for $dest")
        Iterator.single(n)
      }
    }.count()
    // an all-empty frame must still round-trip: land ONE empty
    // container so the reader finds the schema (and zero rows)
    val fs = new Path(out).getFileSystem(confSer.value)
    if (fs.globStatus(new Path(out, "part-*.avro")).isEmpty) {
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      val os = fs.create(new Path(out, "part-00000.avro"), true)
      writer.create(schema, os)
      writer.close()
    }
    ()
  }

  /** Distributed read: one task per container file; the declared Spark
    * schema comes from the first container's embedded writer schema.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.globStatus(new Path(dir, "part-*.avro")).toSeq
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"AvroZone: no .avro containers under $dir")
    val first = {
      val in = new org.apache.avro.mapred.FsInput(new Path(files.head), conf)
      val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    require(first.getType == Schema.Type.RECORD, s"AvroZone: not a record schema: $first")
    val structType = StructType(first.getFields.toArray.map { fo =>
      val f = fo.asInstanceOf[Schema.Field]
      StructField(f.name(), sparkType(f.schema()), nullable = true)
    })
    val names = structType.fieldNames
    val decoders: Array[Any => Any] = structType.fields.map(f => fromAvroValue(f.dataType))
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val rowRdd = spark.sparkContext.parallelize(files, files.size).flatMap { file =>
      val input = new org.apache.avro.mapred.FsInput(new Path(file), confSer.value)
      val reader = new DataFileReader[GenericRecord](
        input, new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h) reader.close()
          h
        }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(names.indices.map { i =>
            rec.get(names(i)) match {
              case null => null
              case v => decoders(i)(v)
            }
          })
        }
      }
    }
    spark.createDataFrame(rowRdd, structType)
  }
}
