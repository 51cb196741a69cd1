package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reader/writer for Apache Iceberg's TABLE-METADATA format (v1) — the
  * other open table format beside Delta, published at iceberg.apache.org
  * (spec: Table Metadata / Manifests / Manifest Lists). The layout is
  * `metadata/vN.metadata.json` (+ `version-hint.text`) → current
  * snapshot → a manifest-list AVRO file → manifest AVRO files → data
  * file paths. No connector jar is needed: the metadata JSON parses
  * with Jackson, the manifests with the avro-core/avro-mapred jars
  * Spark already ships, and the data files are ordinary parquet.
  *
  * Scope (guarded loudly, never silently wrong):
  *  - format-version 1, parquet data files; identity-partitioned
  *    tables read AND write (partition tuples in
  *    `data_file.partition`, Hive-style `data/col=value/` layout,
  *    file-level pruning from the manifests on read);
  *  - append-only snapshots (manifest entries with status DELETED (2)
  *    are honored on read by exclusion; equality/position DELETE FILES
  *    — v2 row-level deletes — are refused via the format-version
  *    check);
  *  - schema types: the primitive set the testdata needs (long, int,
  *    double, float, boolean, string, date, timestamp).
  *
  * Scale shape: manifests are METADATA-sized (Iceberg's own design
  * point — a 100 TB table is ~10^5 manifest entries split across
  * manifest files); this reader walks them on the driver exactly as
  * Iceberg's own planner does, then hands Spark one declared-schema
  * parquet scan over the live files. The writer twin appends a new
  * snapshot per commit, CARRYING FORWARD prior manifests in the new
  * manifest list (so old snapshots stay readable = time travel) and
  * publishing via a new `vN.metadata.json` + `version-hint.text`.
  */
object IcebergTable {

  private val mapper = new ObjectMapper()

  private val ManifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"added_snapshot_id","type":["null","long"],"default":null}
      |]}""".stripMargin)

  /** Manifest-entry schema; partitioned tables add the spec's
    * `data_file.partition` struct (r102) with one nullable field per
    * identity-transformed partition column.
    */
  private def manifestEntrySchema(partitionFields: Seq[(String, DataType)]): Schema = {
    val pField =
      if (partitionFields.isEmpty) ""
      else {
        val fields = partitionFields.map { case (n, dt) =>
          require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"IcebergTable: partition column '$n' is not a valid Avro field name")
          val t = dt match {
            case IntegerType => "\"int\""
            case LongType => "\"long\""
            case StringType => "\"string\""
            case other => throw new IllegalArgumentException(
              s"IcebergTable: unsupported partition column type ${other.simpleString}")
          }
          s"""{"name":"$n","type":["null",$t],"default":null}"""
        }.mkString(",")
        s""",{"name":"partition","type":{"type":"record","name":"r102","fields":[$fields]}}"""
      }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |  {"name":"status","type":"int"},
         |  {"name":"snapshot_id","type":["null","long"],"default":null},
         |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
         |    {"name":"file_path","type":"string"},
         |    {"name":"file_format","type":"string"},
         |    {"name":"record_count","type":"long"},
         |    {"name":"file_size_in_bytes","type":"long"}$pField
         |  ]}}
         |]}""".stripMargin)
  }

  private val ManifestEntrySchema: Schema = manifestEntrySchema(Seq.empty)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------- Iceberg schema JSON <-> Spark StructType ----------

  private def toIcebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamp"
    case other => throw new IllegalArgumentException(
      s"IcebergTable: unsupported column type ${other.simpleString}")
  }

  private def fromIcebergType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" | "timestamptz" => TimestampType
    case other => throw new IllegalArgumentException(
      s"IcebergTable: unsupported Iceberg type $other")
  }

  private def schemaJson(schema: StructType): com.fasterxml.jackson.databind.node.ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("type", "struct")
    val fields = node.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", false)
      fn.put("type", toIcebergType(f.dataType))
    }
    node
  }

  private def parseSchema(node: com.fasterxml.jackson.databind.JsonNode): StructType = {
    require(node != null && node.get("type") != null &&
      node.get("type").asText() == "struct", "IcebergTable: malformed schema node")
    val fields = node.get("fields")
    StructType((0 until fields.size()).map { i =>
      val f = fields.get(i)
      require(f.get("type").isTextual,
        s"IcebergTable: non-primitive column type ${f.get("type")} not supported")
      StructField(f.get("name").asText(), fromIcebergType(f.get("type").asText()),
        nullable = !f.get("required").asBoolean(false))
    })
  }

  // ---------- metadata location ----------

  private def metadataDir(tablePath: String) = new Path(tablePath, "metadata")

  private def currentMetadataPath(fs: FileSystem, tablePath: String): Path = {
    val dir = metadataDir(tablePath)
    require(fs.exists(dir), s"not an Iceberg table: no metadata/ under $tablePath")
    val hint = new Path(dir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
      new Path(dir, s"v$v.metadata.json")
    } else {
      val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
        case n if n.matches("""v\d+\.metadata\.json""") =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toLong
      }
      require(versions.nonEmpty, s"IcebergTable: no vN.metadata.json under $dir")
      new Path(dir, s"v${versions.max}.metadata.json")
    }
  }

  private def readJson(fs: FileSystem, p: Path): com.fasterxml.jackson.databind.JsonNode = {
    val in = fs.open(p)
    try mapper.readTree(in) finally in.close()
  }

  private def readAvro(fs: FileSystem, p: Path,
      conf: org.apache.hadoop.conf.Configuration): Seq[GenericRecord] = {
    val input = new org.apache.avro.mapred.FsInput(p, conf)
    val reader = new DataFileReader[GenericRecord](input, new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }

  /** The snapshot's live data-file paths + declared schema.
    * `filePartitions` is aligned with `files`: each file's identity
    * partition tuple from the manifest's `data_file.partition` record
    * (stringified — the pruning comparison key), empty for
    * unpartitioned tables or manifests written without the field.
    */
  final case class Snapshot(
      snapshotId: Long, files: Seq[String], schema: StructType,
      partitionColumns: Seq[String] = Seq.empty,
      filePartitions: Seq[Map[String, String]] = Seq.empty)

  private def specColumnNames(meta: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val spec = meta.get("partition-spec")
    if (spec == null || !spec.isArray) Seq.empty
    else (0 until spec.size()).map(i => spec.get(i).get("name").asText())
  }

  def snapshot(
      spark: SparkSession, tablePath: String, snapshotId: Option[Long] = None): Snapshot = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, new Path(tablePath))
    val meta = readJson(fs, currentMetadataPath(fs, tablePath))
    val fv = meta.get("format-version").asInt()
    require(fv == 1,
      s"IcebergTable: format-version $fv not supported (v2 row-level deletes " +
        "would be silently wrong — refusing)")
    // partitioned tables ARE readable correctly: unlike Delta (where
    // partition values live only in the log), Iceberg data files carry
    // COMPLETE rows — the partition spec affects file placement and
    // pruning, never row content. Identity partition tuples are read
    // from data_file.partition for FILE-level pruning in [[read]].
    val schema = parseSchema(meta.get("schema"))
    val pcols = specColumnNames(meta)
    val snapshots = meta.get("snapshots")
    require(snapshots != null && snapshots.size() > 0, "IcebergTable: no snapshots")
    val wantId = snapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    val snap = (0 until snapshots.size()).map(snapshots.get)
      .find(_.get("snapshot-id").asLong() == wantId)
      .getOrElse(throw new IllegalArgumentException(
        s"IcebergTable: snapshot $wantId not found (expired?)"))
    val listPath = new Path(snap.get("manifest-list").asText())
    val manifests = readAvro(fs, listPath, conf).map(_.get("manifest_path").toString)
    val entries = manifests.flatMap { mp =>
      readAvro(fs, new Path(mp), conf).map { e =>
        val status = e.get("status").asInstanceOf[Int]
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        if (status != 2) {
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"),
            s"IcebergTable: data file format $fmt not supported")
        }
        val tuple: Map[String, String] =
          if (df.getSchema.getField("partition") == null) Map.empty
          else df.get("partition") match {
            case null => Map.empty
            case r: GenericRecord =>
              r.getSchema.getFields.toArray.map(_.asInstanceOf[Schema.Field].name())
                .flatMap(n => Option(r.get(n)).map(v => n -> v.toString)).toMap
            case _ => Map.empty
          }
        (df.get("file_path").toString, status, tuple)
      }
    }
    // DELETED entries win over adds anywhere in the snapshot's list —
    // defensive toward lists that still carry the pre-delete manifest
    val deleted = entries.collect { case (p, 2, _) => p }.toSet
    val live = entries.collect { case (p, s, t) if s != 2 && !deleted(p) => (p, t) }
      .distinctBy(_._1)
    Snapshot(wantId, live.map(_._1), schema, pcols, live.map(_._2))
  }

  /** Read a snapshot as a DataFrame: metadata walk → declared-schema
    * parquet scan over the live files (pushdown/pruning intact).
    * `partitionFilter` prunes at the FILE level from the manifests'
    * identity partition tuples — the planning step Iceberg's own
    * reader performs — before Spark ever sees the file list (values
    * compared stringified, as recorded in the tuple).
    */
  def read(
      spark: SparkSession, tablePath: String, snapshotId: Option[Long] = None,
      partitionFilter: Map[String, String] = Map.empty): DataFrame = {
    val snap = snapshot(spark, tablePath, snapshotId)
    val files =
      if (partitionFilter.isEmpty) snap.files
      else {
        require(partitionFilter.keySet.subsetOf(snap.partitionColumns.toSet),
          s"IcebergTable: partition filter on ${partitionFilter.keySet} but the " +
            s"table is partitioned by [${snap.partitionColumns.mkString(",")}]")
        snap.files.zip(snap.filePartitions).collect {
          case (f, pv) if partitionFilter.forall { case (k, v) => pv.get(k).contains(v) } => f
        }
      }
    require(files.nonEmpty,
      s"IcebergTable: snapshot ${snap.snapshotId} of $tablePath has no data files" +
        (if (partitionFilter.nonEmpty) s" matching $partitionFilter" else ""))
    spark.read.schema(snap.schema).parquet(files: _*)
  }

  private def writeAvro(
      fs: FileSystem, p: Path, schema: Schema, records: Seq[GenericRecord]): Long = {
    val out = fs.create(p, false)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    try {
      writer.create(schema, out)
      records.foreach(writer.append)
    } finally writer.close()
    fs.getFileStatus(p).getLen
  }

  /** APPEND a new snapshot: data files staged and moved under the
    * table's `data/` dir, one new manifest for them, a new manifest
    * LIST carrying forward every prior manifest (old snapshots remain
    * readable — time travel), then `vN+1.metadata.json` with the
    * snapshot appended and `version-hint.text` repointed (the publish
    * step; concurrent writers need a catalog's atomic swap, exactly as
    * the Iceberg spec documents — out of scope here like the Delta
    * writer's object-store caveat). Returns the new snapshot id.
    */
  def append(
      spark: SparkSession, tablePath: String, df: DataFrame,
      partitionBy: Seq[String] = Seq.empty): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    val metaDir = metadataDir(tablePath)
    val exists = fs.exists(metaDir) && fs.listStatus(metaDir).nonEmpty
    val (prevMeta, prevVersion) =
      if (exists) {
        val p = currentMetadataPath(fs, tablePath)
        (Some(readJson(fs, p)),
          p.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong)
      } else (None, 0L)
    prevMeta.foreach { m =>
      val have = parseSchema(m.get("schema")).fields.map(f => (f.name, f.dataType)).toSeq
      val incoming = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(have == incoming,
        s"IcebergTable: append schema mismatch — table declares $have, append brings $incoming")
      val prevSpec = specColumnNames(m)
      require(prevSpec == partitionBy,
        s"IcebergTable: append partitioning mismatch — table declares " +
          s"[${prevSpec.mkString(",")}], append brings [${partitionBy.mkString(",")}]")
    }
    df.schema.fields.foreach(f => toIcebergType(f.dataType)) // loud unsupported-type check
    partitionBy.foreach(c => require(df.schema.fieldNames.contains(c),
      s"IcebergTable: partition column $c missing from the append schema"))
    val pfields: Seq[(String, DataType)] =
      partitionBy.map(c => c -> df.schema(c).dataType)
    val entrySchema = manifestEntrySchema(pfields)
    fs.mkdirs(metaDir)
    fs.mkdirs(new Path(table, "data"))
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(table, s"_ice_stage_$stamp")
    // (path, len, typed identity partition tuple) per moved data file
    val dataFiles: Seq[(String, Long, Map[String, Any])] =
      if (partitionBy.isEmpty) {
        df.write.parquet(stage.toString)
        val parts = fs.globStatus(new Path(stage, "part-*.parquet")).toSeq.map(_.getPath)
        val m = parts.zipWithIndex.map { case (p, i) =>
          val dest = new Path(table, s"data/part-$stamp-$i.parquet")
          require(fs.rename(p, dest), s"IcebergTable: move failed for $p")
          val st = fs.getFileStatus(dest)
          (fs.makeQualified(dest).toString, st.getLen, Map.empty[String, Any])
        }
        fs.delete(stage, true)
        m
      } else {
        // Iceberg data files carry COMPLETE rows — identity partition
        // source columns included — but Spark's partitionBy drops the
        // partitioning columns from the files. Duplicating each source
        // column under a __p_ alias keeps the real column in the data
        // while the alias drives the Hive-style placement; the alias
        // prefix is stripped from the directory names on the move.
        val dup = partitionBy.foldLeft(df)((d, c) =>
          d.withColumn(s"__p_$c", org.apache.spark.sql.functions.col(c)))
        dup.write.partitionBy(partitionBy.map(c => s"__p_$c"): _*).parquet(stage.toString)
        val pattern = partitionBy.map(_ => "*").mkString("/")
        val parts = fs.globStatus(new Path(stage, s"$pattern/part-*.parquet"))
          .toSeq.map(_.getPath).sortBy(_.toString)
        val stagePrefix = fs.makeQualified(stage).toString + "/"
        val ptypes = pfields.toMap
        val m = parts.zipWithIndex.map { case (p, i) =>
          val rel0 = fs.makeQualified(p).toString.stripPrefix(stagePrefix)
          require(rel0.length < fs.makeQualified(p).toString.length,
            s"IcebergTable: stage-relative path resolution failed for $p")
          val segs = rel0.split('/').dropRight(1).map(_.stripPrefix("__p_"))
          val tuple: Map[String, Any] = segs.map { s =>
            val Array(k, v) = s.split("=", 2)
            val typed: Any =
              if (v == "__HIVE_DEFAULT_PARTITION__") null
              else ptypes(k) match {
                case IntegerType => Integer.valueOf(DeltaLog.unescapePathName(v).toInt)
                case LongType => java.lang.Long.valueOf(DeltaLog.unescapePathName(v).toLong)
                case _ => DeltaLog.unescapePathName(v)
              }
            k -> typed
          }.toMap
          require(tuple.keySet == partitionBy.toSet,
            s"IcebergTable: unexpected partition layout under $p")
          val rel = "data/" + segs.mkString("/") + s"/part-$stamp-$i.parquet"
          val dest = new Path(table, rel)
          fs.mkdirs(dest.getParent)
          require(fs.rename(p, dest), s"IcebergTable: move failed for $p")
          val st = fs.getFileStatus(dest)
          (fs.makeQualified(dest).toString, st.getLen, tuple)
        }
        fs.delete(stage, true)
        m
      }

    val snapshotId = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    // one manifest for this append
    val entries = dataFiles.map { case (path, len, tuple) =>
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      val d = new GenericData.Record(entrySchema.getField("data_file").schema())
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", 0L) // stats optional for this reader; loud zeros
      d.put("file_size_in_bytes", len)
      if (partitionBy.nonEmpty) {
        val pr = new GenericData.Record(
          entrySchema.getField("data_file").schema().getField("partition").schema())
        tuple.foreach { case (k, v) => pr.put(k, v) }
        d.put("partition", pr)
      }
      e.put("data_file", d)
      e
    }
    val manifestPath = new Path(metaDir, s"manifest-$stamp.avro")
    val manifestLen = writeAvro(fs, manifestPath, entrySchema, entries)

    // carry forward the prior snapshot's manifests
    val prevManifests: Seq[(String, Long)] = prevMeta.toSeq.flatMap { m =>
      val curId = m.get("current-snapshot-id").asLong()
      val snaps = m.get("snapshots")
      (0 until snaps.size()).map(snaps.get)
        .find(_.get("snapshot-id").asLong() == curId).toSeq
        .flatMap { s =>
          readAvro(fs, new Path(s.get("manifest-list").asText()), conf)
            .map(r => (r.get("manifest_path").toString, r.get("manifest_length").asInstanceOf[Long]))
        }
    }
    val listRecords = (prevManifests :+
      (fs.makeQualified(manifestPath).toString, manifestLen)).map { case (p, len) =>
      val r = new GenericData.Record(ManifestListSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r
    }
    val listPath = new Path(metaDir, s"snap-$snapshotId-$stamp.avro")
    writeAvro(fs, listPath, ManifestListSchema, listRecords)

    // new metadata json: prior snapshots + this one
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid",
      prevMeta.map(_.get("table-uuid").asText()).getOrElse(java.util.UUID.randomUUID().toString))
    meta.put("location", tablePath)
    meta.put("last-updated-ms", System.currentTimeMillis())
    meta.put("last-column-id", df.schema.size)
    meta.set[com.fasterxml.jackson.databind.node.ObjectNode]("schema", schemaJson(df.schema))
    // v1's required legacy "partition-spec" plus the modern
    // "partition-specs"/"default-spec-id" pair; identity transforms
    // over the schema field ids assigned by schemaJson (index + 1)
    val legacySpec = meta.putArray("partition-spec")
    partitionBy.zipWithIndex.foreach { case (c, i) =>
      val f = legacySpec.addObject()
      f.put("name", c)
      f.put("transform", "identity")
      f.put("source-id", df.schema.fieldIndex(c) + 1)
      f.put("field-id", 1000 + i)
    }
    val specs = meta.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    val specFields = spec0.putArray("fields")
    partitionBy.zipWithIndex.foreach { case (c, i) =>
      val f = specFields.addObject()
      f.put("name", c)
      f.put("transform", "identity")
      f.put("source-id", df.schema.fieldIndex(c) + 1)
      f.put("field-id", 1000 + i)
    }
    meta.put("default-spec-id", 0)
    meta.putObject("properties")
    meta.put("current-snapshot-id", snapshotId)
    val snaps = meta.putArray("snapshots")
    prevMeta.foreach { m =>
      val ps = m.get("snapshots")
      (0 until ps.size()).foreach(i => snaps.add(ps.get(i)))
    }
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapshotId)
    sn.put("timestamp-ms", System.currentTimeMillis())
    sn.put("manifest-list", fs.makeQualified(listPath).toString)
    sn.putObject("summary").put("operation", "append")

    val newVersion = prevVersion + 1
    val metaPath = new Path(metaDir, s"v$newVersion.metadata.json")
    val out = fs.create(metaPath, false) // put-if-absent publish
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(newVersion.toString.getBytes("UTF-8")) finally hint.close()
    snapshotId
  }
}
