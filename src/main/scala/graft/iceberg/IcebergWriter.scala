package graft.iceberg

import java.nio.ByteBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import IcebergModel._

/** Write path — create/append snapshots and compact an Iceberg-layout
  * table (the stretch the reference never ships: its extension is
  * read-only, `iceberg_functions.cpp:20-24`; writes in its ecosystem come
  * from Spark, SURVEY §7.4). Emits the metadata family the read path
  * consumes — `vN.metadata.json` + `version-hint.text`, Avro manifest
  * list, Avro manifests with record counts — so tables round-trip through
  * `IcebergScan` including snapshot time travel and incremental reads.
  *
  * Scope: v2 layout, flat (unpartitioned) primitive-column schemas,
  * append + compaction snapshots. Data files are written by Spark's
  * parquet sink (distributed); only the small metadata is driver-side.
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

  /** Avro type name for a partition value of this transform over this
    * source column (identity keeps the column's domain; date-ordinal
    * transforms produce int ordinals, matching Iceberg). */
  private def partitionAvroType(transform: String, source: DataType): String =
    transform match {
      case "identity" => source match {
        case IntegerType | DateType => "int"
        case LongType => "long"
        case StringType => "string"
        case other => throw new IllegalArgumentException(
          s"identity partition over ${other.sql} not supported")
      }
      case "day" | "days" | "month" | "months" | "year" | "years" => "int"
      case other => throw new IllegalArgumentException(s"unsupported transform $other")
    }

  /** Manifest-entry schema, optionally extended with a typed `partition`
    * record (per spec fields) and Iceberg-style `lower_bounds`/
    * `upper_bounds` (array-of-{key,value} map encoding, spec appendix).
    * All three are nullable with null defaults so manifests stay readable
    * by schema-resolving readers that don't know them. */
  private def entrySchemaFor(partitionFields: Seq[(String, String)]): Schema = {
    val partField =
      if (partitionFields.isEmpty) ""
      else {
        val fs = partitionFields.map { case (n, t) =>
          s"""{"name":"$n","type":["null","$t"],"default":null}"""
        }.mkString(",")
        s""",{"name":"partition","type":["null",{"type":"record","name":"r102","fields":[$fs]}],"default":null}"""
      }
    new Schema.Parser().parse(s"""
      {"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"record_count","type":"long"}
          $partField,
          {"name":"lower_bounds","type":["null",{"type":"array","items":
            {"type":"record","name":"k126_v127","fields":[
              {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
           "default":null},
          {"name":"upper_bounds","type":["null",{"type":"array","items":"k126_v127"}],
           "default":null}
        ]}}]}""")
  }

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

  // ---- table state ------------------------------------------------------

  private final case class State(
      version: Int,
      info: IcebergMetadataParser.ParseInfo,
      snapshots: Seq[JsonNode]) {
    def nextSnapshotId: Long =
      (snapshots.map(_.get("snapshot-id").asLong) :+ 0L).max + 1
    def nextSeq: Long =
      (snapshots.map(_.get("sequence-number").asLong) :+ 0L).max + 1
    def nextTsMs: Long = math.max(
      System.currentTimeMillis(),
      (snapshots.map(_.get("timestamp-ms").asLong) :+ 0L).max + 1)
  }

  private def loadState(path: String, conf: Configuration): Option[State] = {
    val hintPath = new Path(new Path(path, "metadata"), DefaultVersionHintFile)
    if (!hintPath.getFileSystem(conf).exists(hintPath)) None
    else {
      val v = IcebergIO.readString(hintPath.toString, conf).trim.toInt
      val info = IcebergMetadataParser.parseInfo(IcebergIO.readString(
        new Path(path, s"metadata/v$v.metadata.json").toString, conf))
      Some(State(v, info, info.snapshots))
    }
  }

  /** Per-file row counts from the parquet FOOTERS of `dir` — footer-only
    * I/O (a few KB per file), replacing the full re-scan of every written
    * dataset the round-2 write path did (2× write-path I/O at scale). The
    * footer's aggregate row count is exact — it is what the writer itself
    * committed. */
  private def footerCounts(dir: Path, conf: Configuration): Seq[(String, Long)] = {
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try (st.getPath.toString, r.getRecordCount) finally r.close()
      }
      .sortBy(_._1)
  }

  /** Distributed parquet write (with field ids) → (file, rowCount) pairs. */
  private def writeDataFiles(df: DataFrame, dataDir: Path): Seq[(String, Long)] = {
    val withIds = df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      col(f.name).as(f.name,
        new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
    }.toIndexedSeq: _*)
    withIds.write.parquet(dataDir.toString)
    footerCounts(dataDir, df.sparkSession.sessionState.newHadoopConf())
  }

  private def writeManifest(
      p: Path, conf: Configuration, entries: Seq[ManifestEntry],
      partitionFields: Seq[(String, String)] = Seq.empty): Unit = {
    val entrySchema = entrySchemaFor(partitionFields)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val boundsSchema = dataFileSchema.getField("lower_bounds").schema()
      .getTypes.get(1) // non-null branch of the union
    def boundsArray(m: Map[Int, Array[Byte]]): java.util.List[GenericRecord] = {
      val arr = new java.util.ArrayList[GenericRecord](m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val kv = new GenericData.Record(boundsSchema.getElementType)
        kv.put("key", k)
        kv.put("value", ByteBuffer.wrap(v))
        arr.add(kv)
      }
      arr
    }
    writeAvro(entrySchema, p, conf) {
      entries.map { e =>
        val dfr = new GenericData.Record(dataFileSchema)
        dfr.put("content", e.content)
        dfr.put("file_path", e.filePath)
        dfr.put("file_format", e.fileFormat)
        dfr.put("record_count", e.recordCount)
        if (partitionFields.nonEmpty) {
          val pSchema = dataFileSchema.getField("partition").schema()
            .getTypes.get(1)
          val pr = new GenericData.Record(pSchema)
          partitionFields.foreach { case (n, _) =>
            pr.put(n, e.partition.getOrElse(n, null))
          }
          dfr.put("partition", pr)
        }
        if (e.lowerBounds.nonEmpty) dfr.put("lower_bounds", boundsArray(e.lowerBounds))
        if (e.upperBounds.nonEmpty) dfr.put("upper_bounds", boundsArray(e.upperBounds))
        val rec = new GenericData.Record(entrySchema)
        rec.put("status", e.status)
        rec.put("data_file", dfr)
        rec
      }
    }
  }

  /** Write manifest list + metadata.json + hint; returns the snapshot id. */
  private def commitSnapshot(
      path: String,
      conf: Configuration,
      state: Option[State],
      schema: StructType,
      snapshotId: Long,
      seq: Long,
      manifests: Seq[Manifest]): Long = {
    val metaDir = new Path(path, "metadata")
    val listPath = new Path(metaDir, s"snap-$snapshotId-1-list.avro")
    writeAvro(manifestListSchema, listPath, conf) {
      manifests.map { m =>
        val rec = new GenericData.Record(manifestListSchema)
        rec.put("manifest_path", m.manifestPath)
        rec.put("content", m.content)
        rec.put("sequence_number", m.sequenceNumber)
        rec
      }
    }
    val root: ObjectNode = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("current-schema-id", 0)
    val schemas: ArrayNode = root.putArray("schemas")
    val schemaNode = schemas.addObject()
    schemaNode.put("schema-id", 0)
    schemaNode.put("type", "struct")
    val fieldsNode = schemaNode.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fieldsNode.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", false)
      fn.put("type", toIcebergType(f.dataType))
    }
    root.put("current-snapshot-id", snapshotId)
    val snapsNode = root.putArray("snapshots")
    state.map(_.snapshots).getOrElse(Seq.empty).foreach(snapsNode.add)
    val sn = snapsNode.addObject()
    sn.put("snapshot-id", snapshotId)
    sn.put("sequence-number", seq)
    sn.put("timestamp-ms", state.map(_.nextTsMs).getOrElse(System.currentTimeMillis()))
    sn.put("schema-id", 0)
    sn.put("manifest-list", listPath.toString)

    val version = state.map(_.version + 1).getOrElse(1)
    writeString(new Path(metaDir, s"v$version.metadata.json"), conf,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeString(new Path(metaDir, DefaultVersionHintFile), conf, version.toString)
    snapshotId
  }

  /** Type widenings an append may apply to an existing column — the
    * evolutions the field-id read path resolves transparently (old files'
    * narrower physical type upcasts under the widened read schema, the
    * shape the reference's schema-evolution test exercises at v8→v9). */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale == f.scale && t.precision >= f.precision
    case _ => false
  }

  /** Append `df` as a new snapshot of the table at `path`, creating the
    * table if absent. Returns the new snapshot id.
    *
    * Schema evolution: `df` may widen existing columns (int→long,
    * float→double, decimal precision) and may APPEND new columns — field
    * ids are positional, so existing columns keep their ids and old files
    * read NULL for columns added after they were written. Renames,
    * reorders, drops, and narrowings are rejected. */
  def write(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val state = loadState(path, conf)
    state.foreach { st =>
      val cols = IcebergSchemaParser.parseSchemaById(st.info.schemas, st.info.schemaId)
      val existing = cols.map(c => (c.name, c.dataType))
      val incoming = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
      require(incoming.size >= existing.size,
        s"append schema mismatch: cannot drop columns (table has ${existing.map(_._1)})")
      existing.zip(incoming.take(existing.size)).foreach {
        case ((on, ot), (nn, nt)) =>
          require(on == nn,
            s"append schema mismatch: column '$on' vs '$nn' (renames/reorders not supported)")
          require(ot == nt || widens(ot, nt),
            s"append schema mismatch: column '$on' cannot change ${ot.sql} -> ${nt.sql}")
      }
    }
    val snapshotId = state.map(_.nextSnapshotId).getOrElse(1L)
    val seq = state.map(_.nextSeq).getOrElse(1L)

    val fileCounts = writeDataFiles(df, new Path(path, s"data/snap-$snapshotId"))
    val manifestPath = new Path(path, s"metadata/snap-$snapshotId-m0.avro")
    writeManifest(manifestPath, conf, fileCounts.map { case (f, n) =>
      ManifestEntry(status = 1, content = 0, filePath = f,
        fileFormat = "PARQUET", recordCount = n)
    })
    // previous snapshot's manifests carried forward + the new one
    val prevManifests: Seq[Manifest] = state match {
      case Some(st) if st.snapshots.nonEmpty =>
        val latest = IcebergMetadataParser.latest(st.info, skipSchema = true)
        ManifestReader.readManifestList(latest.manifestList, conf, latest.formatVersion)
      case _ => Seq.empty
    }
    commitSnapshot(path, conf, state, df.schema, snapshotId, seq,
      prevManifests :+ Manifest(manifestPath.toString, seq, 0))
  }

  /** Row-level DELETE, merge-on-read: rows matching `predicate` are
    * tombstoned by a v2 position-delete file (`file_path`, `pos`) in a new
    * snapshot — no data file is rewritten. The scan's null-safe anti join
    * (J1) subtracts them at read time, so this also round-trips the MoR
    * read path against our own writer. Positions come from the parquet
    * `_metadata.row_index` of each live data file, keyed by the exact path
    * string the manifests carry. */
  def delete(spark: SparkSession, path: String,
             predicate: org.apache.spark.sql.Column): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val state = loadState(path, conf).getOrElse(
      throw new IllegalArgumentException(s"delete: no Iceberg table at $path"))
    val latest = IcebergMetadataParser.latest(state.info, skipSchema = false)
    val meta = ManifestReader.loadTable(path, latest, conf, allowMovedPaths = false)
    val liveFiles = meta.entries.collect {
      case (m, es) if m.content == 0 =>
        es.filter(e => e.status != 2 && e.content == 0).map(_.filePath)
    }.flatten
    val schema = IcebergSchemaParser.toStructType(latest.schema)

    // qualified-URI → manifest path string, same bridge the scan uses
    import spark.implicits._
    val qualify: String => String = p => {
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    val fileMap = liveFiles.map(f => (qualify(f), f)).toDF("__qual", "__orig")

    val snapshotId = state.nextSnapshotId
    val seq = state.nextSeq
    val positions = spark.read.schema(schema).parquet(liveFiles: _*)
      .select(col("*"),
        col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
      .filter(predicate)
      .join(org.apache.spark.sql.functions.broadcast(fileMap),
        col("__file") === col("__qual"))
      .select(col("__orig").as("file_path"), col("__pos").as("pos"))

    val delDir = new Path(path, s"data/snap-$snapshotId-deletes")
    positions.write.parquet(delDir.toString)
    val fileCounts = footerCounts(delDir, conf)

    val manifestPath = new Path(path, s"metadata/snap-$snapshotId-m0.avro")
    writeManifest(manifestPath, conf, fileCounts.map { case (f, n) =>
      ManifestEntry(status = 1, content = 1, filePath = f, // POSITION_DELETES
        fileFormat = "PARQUET", recordCount = n)
    })
    val prevManifests = ManifestReader.readManifestList(
      latest.manifestList, conf, latest.formatVersion)
    commitSnapshot(path, conf, Some(state), schema, snapshotId, seq,
      prevManifests :+ Manifest(manifestPath.toString, seq, content = 1))
  }

  /** Row-level UPDATE, merge-on-read, in ONE snapshot: matching rows are
    * tombstoned by a position-delete file AND their updated versions are
    * appended as a new data file — the same commit shape the reference's
    * generated tables carry ('write.update.mode'='merge-on-read' UPDATEs,
    * scripts/test_data_generator/updates_v2 in the reference). */
  def update(spark: SparkSession, path: String,
             predicate: org.apache.spark.sql.Column,
             assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val state = loadState(path, conf).getOrElse(
      throw new IllegalArgumentException(s"update: no Iceberg table at $path"))
    val latest = IcebergMetadataParser.latest(state.info, skipSchema = false)
    val meta = ManifestReader.loadTable(path, latest, conf, allowMovedPaths = false)
    val liveFiles = meta.entries.collect {
      case (m, es) if m.content == 0 =>
        es.filter(e => e.status != 2 && e.content == 0).map(_.filePath)
    }.flatten
    val schema = IcebergSchemaParser.toStructType(latest.schema)
    require(assignments.keySet.subsetOf(schema.fieldNames.toSet),
      s"update: unknown columns ${assignments.keySet -- schema.fieldNames}")

    import spark.implicits._
    val qualify: String => String = p => {
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    val fileMap = liveFiles.map(f => (qualify(f), f)).toDF("__qual", "__orig")
    val snapshotId = state.nextSnapshotId
    val seq = state.nextSeq

    val matched = spark.read.schema(schema).parquet(liveFiles: _*)
      .select(col("*"),
        col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__pos"))
      .filter(predicate)

    // tombstones for the old versions
    val positions = matched
      .join(org.apache.spark.sql.functions.broadcast(fileMap),
        col("__file") === col("__qual"))
      .select(col("__orig").as("file_path"), col("__pos").as("pos"))
    val delDir = new Path(path, s"data/snap-$snapshotId-deletes")
    positions.write.parquet(delDir.toString)
    val delCounts = footerCounts(delDir, conf)

    // updated versions of the matched rows
    val updated = assignments.foldLeft(
        matched.drop("__file", "__pos"): DataFrame) {
      case (d, (name, value)) => d.withColumn(name, value)
    }.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val dataCounts = writeDataFiles(updated, new Path(path, s"data/snap-$snapshotId"))

    val dataManifest = new Path(path, s"metadata/snap-$snapshotId-m0.avro")
    writeManifest(dataManifest, conf, dataCounts.map { case (f, n) =>
      ManifestEntry(status = 1, content = 0, filePath = f,
        fileFormat = "PARQUET", recordCount = n)
    })
    val delManifest = new Path(path, s"metadata/snap-$snapshotId-m1.avro")
    writeManifest(delManifest, conf, delCounts.map { case (f, n) =>
      ManifestEntry(status = 1, content = 1, filePath = f,
        fileFormat = "PARQUET", recordCount = n)
    })
    val prevManifests = ManifestReader.readManifestList(
      latest.manifestList, conf, latest.formatVersion)
    commitSnapshot(path, conf, Some(state), schema, snapshotId, seq,
      prevManifests ++ Seq(
        Manifest(dataManifest.toString, seq, content = 0),
        Manifest(delManifest.toString, seq, content = 1)))
  }

  /** Compact the table: rewrite all live rows into fresh data files in ONE
    * new snapshot whose manifests mark every previous data file DELETED —
    * the maintenance operation behind the reference's own checked-in table
    * (its latest snapshot shows exactly this ADDED+DELETED manifest shape,
    * `iceberg_metadata.test:13-17`). Older snapshots stay readable (their
    * files are not removed), so time travel still works. */
  def compact(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val state = loadState(path, conf).getOrElse(
      throw new IllegalArgumentException(s"compact: no Iceberg table at $path"))
    val latest = IcebergMetadataParser.latest(state.info, skipSchema = false)
    val meta = ManifestReader.loadTable(path, latest, conf, allowMovedPaths = false)
    val liveEntries = meta.entries.collect {
      case (m, es) if m.content == 0 => es.filter(e => e.status != 2 && e.content == 0)
    }.flatten

    val df = IcebergScan.scan(spark, path)
    val snapshotId = state.nextSnapshotId
    val seq = state.nextSeq
    val fileCounts = writeDataFiles(df, new Path(path, s"data/snap-$snapshotId"))

    val addedPath = new Path(path, s"metadata/snap-$snapshotId-m0.avro")
    writeManifest(addedPath, conf, fileCounts.map { case (f, n) =>
      ManifestEntry(status = 1, content = 0, filePath = f,
        fileFormat = "PARQUET", recordCount = n)
    })
    val deletedPath = new Path(path, s"metadata/snap-$snapshotId-m1.avro")
    writeManifest(deletedPath, conf,
      liveEntries.map(_.copy(status = 2))) // DELETED

    commitSnapshot(path, conf, Some(state), df.schema, snapshotId, seq, Seq(
      Manifest(addedPath.toString, seq, 0),
      Manifest(deletedPath.toString, seq, 0)))
  }
}
