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
  * long, int, double, float, boolean, string; nullable as
  * `["null", T]` unions. Nested/logical types refuse.
  *
  * Scale shape: both directions are embarrassingly parallel over
  * files/partitions, no shuffle, no driver data path (only the FILE
  * LIST touches the driver — the same contract as every other source
  * here).
  */
object AvroZone {

  private def avroType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case StringType => "string"
    case other => throw new IllegalArgumentException(
      s"AvroZone: unsupported column type ${other.simpleString}")
  }

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
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

  /** The record schema JSON for a Spark schema (all fields nullable). */
  def avroSchemaJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null","${avroType(f.dataType)}"],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"graft_row","fields":[$fields]}"""
  }

  /** Distributed write: each partition lands one container file. */
  def write(df: DataFrame, outDir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = outDir
    new Path(out).getFileSystem(confSer.value).mkdirs(new Path(out))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val fs = new Path(out).getFileSystem(confSer.value)
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val tmp = new Path(out, s"_tmp-part-$pid-$attempt.avro")
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
            rec.put(names(i), if (row.isNullAt(i)) null else row.get(i))
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
    if (fs.globStatus(new Path(out, "*.avro")).isEmpty) {
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
    val files = fs.globStatus(new Path(dir, "*.avro")).toSeq
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
          Row.fromSeq(names.map { n =>
            rec.get(n) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
          }.toSeq)
        }
      }
    }
    spark.createDataFrame(rowRdd, structType)
  }
}
