package graft.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, input_file_name, lit}
import org.apache.spark.sql.types._

import IcebergModel._

/** Write path — create and append snapshots of an Iceberg-layout table
  * (the stretch the reference never ships: its extension is read-only,
  * `iceberg_functions.cpp:20-24`; writes in its ecosystem come from Spark,
  * SURVEY §7.4). Emits the metadata family the read path consumes —
  * `vN.metadata.json` + `version-hint.text`, Avro manifest list, Avro
  * manifest of ADDED data files with record counts — so tables round-trip
  * through `IcebergScan` including snapshot time travel and incremental
  * reads.
  *
  * Scope: v2 layout, flat (unpartitioned) primitive-column schemas,
  * append-only snapshots. Data files are written by Spark's parquet sink
  * (distributed); only the small metadata is driver-side.
  */
object IcebergWriter {

  private val mapper = new ObjectMapper()

  private def toIcebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case StringType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"IcebergWriter supports primitive columns only, got ${other.sql}")
  }

  private val manifestListSchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"}]}""")

  private val manifestEntrySchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int"},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private def writeAvro(schema: Schema, out: Path, conf: Configuration)(
      records: Seq[GenericRecord]): Unit = {
    val os = out.getFileSystem(conf).create(out, true)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, os)
    try records.foreach(w.append) finally w.close()
  }

  private def writeString(p: Path, conf: Configuration, s: String): Unit = {
    val os = p.getFileSystem(conf).create(p, true)
    try os.write(s.getBytes("UTF-8")) finally os.close()
  }

  /** Append `df` as a new snapshot of the table at `path`, creating the
    * table if absent. Returns the new snapshot id. */
  def write(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val metaDir = new Path(path, "metadata")

    // existing state (if any)
    val hintPath = new Path(metaDir, DefaultVersionHintFile)
    val existing: Option[(Int, IcebergMetadataParser.ParseInfo)] =
      if (fs.exists(hintPath)) {
        val v = IcebergIO.readString(hintPath.toString, conf).trim.toInt
        val info = IcebergMetadataParser.parseInfo(IcebergIO.readString(
          new Path(metaDir, s"v$v.metadata.json").toString, conf))
        Some((v, info))
      } else None
    existing.foreach { case (_, info) =>
      val cols = IcebergSchemaParser.parseSchemaById(info.schemas, info.schemaId)
      val existingNames = cols.map(c => (c.name, c.dataType))
      val newNames = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
      require(existingNames == newNames,
        s"append schema mismatch: table has $existingNames, data has $newNames")
    }
    val prevSnapshots = existing.map(_._2.snapshots).getOrElse(Seq.empty)
    val prevSnapId = prevSnapshots.map(_.get("snapshot-id").asLong) match {
      case Seq() => 0L; case ids => ids.max
    }
    val prevSeq = prevSnapshots.map(n => n.get("sequence-number").asLong) match {
      case Seq() => 0L; case seqs => seqs.max
    }
    val prevTsMax = prevSnapshots.map(_.get("timestamp-ms").asLong) match {
      case Seq() => 0L; case ts => ts.max
    }
    val snapshotId = prevSnapId + 1
    val seq = prevSeq + 1
    val tsMs = math.max(System.currentTimeMillis(), prevTsMax + 1)

    // 1. data files (distributed write into a per-snapshot directory).
    // Columns carry parquet field ids (spark.sql.parquet.fieldId.write is
    // on by default), so the field-id-keyed read schema resolves against
    // these files exactly like against iceberg-spark-written ones.
    val dataDir = new Path(path, s"data/snap-$snapshotId")
    val withIds = df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      org.apache.spark.sql.functions.col(f.name).as(f.name,
        new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
    }.toIndexedSeq: _*)
    withIds.write.parquet(dataDir.toString)
    val fileCounts = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

    // 2. manifest of the ADDED files
    val manifestPath = new Path(metaDir, s"snap-$snapshotId-m0.avro")
    writeAvro(manifestEntrySchema, manifestPath, conf) {
      fileCounts.map { case (file, n) =>
        val dfr = new GenericData.Record(
          manifestEntrySchema.getField("data_file").schema())
        dfr.put("content", 0)
        dfr.put("file_path", file)
        dfr.put("file_format", "PARQUET")
        dfr.put("record_count", n)
        val rec = new GenericData.Record(manifestEntrySchema)
        rec.put("status", 1) // ADDED
        rec.put("data_file", dfr)
        rec
      }
    }

    // 3. manifest list: previous snapshot's manifests carried forward + new
    val prevManifests: Seq[Manifest] = existing match {
      case Some((_, info)) if prevSnapshots.nonEmpty =>
        val latest = IcebergMetadataParser.latest(info, skipSchema = true)
        ManifestReader.readManifestList(latest.manifestList, conf, latest.formatVersion)
      case _ => Seq.empty
    }
    val listPath = new Path(metaDir, s"snap-$snapshotId-1-list.avro")
    writeAvro(manifestListSchema, listPath, conf) {
      (prevManifests :+ Manifest(manifestPath.toString, seq, 0)).map { m =>
        val rec = new GenericData.Record(manifestListSchema)
        rec.put("manifest_path", m.manifestPath)
        rec.put("content", m.content)
        rec.put("sequence_number", m.sequenceNumber)
        rec
      }
    }

    // 4. metadata.json (schema ids 1..n, required=false like the reference's
    // generator output) + version hint
    val root: ObjectNode = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("current-schema-id", 0)
    val schemas: ArrayNode = root.putArray("schemas")
    val schemaNode = schemas.addObject()
    schemaNode.put("schema-id", 0)
    schemaNode.put("type", "struct")
    val fieldsNode = schemaNode.putArray("fields")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fieldsNode.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", false)
      fn.put("type", toIcebergType(f.dataType))
    }
    root.put("current-snapshot-id", snapshotId)
    val snapsNode = root.putArray("snapshots")
    prevSnapshots.foreach(n => snapsNode.add(n))
    val sn = snapsNode.addObject()
    sn.put("snapshot-id", snapshotId)
    sn.put("sequence-number", seq)
    sn.put("timestamp-ms", tsMs)
    sn.put("schema-id", 0)
    sn.put("manifest-list", listPath.toString)

    val version = existing.map(_._1 + 1).getOrElse(1)
    writeString(new Path(metaDir, s"v$version.metadata.json"), conf,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeString(hintPath, conf, version.toString)
    snapshotId
  }
}
