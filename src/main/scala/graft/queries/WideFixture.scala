package graft.queries

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** WIDE-METADATA fixture: a table whose snapshot carries `manifests`
  * manifest files of `entriesPer` entries each — the metadata shape of a
  * 100 TB / 100k-file deployment — built in seconds by synthesizing the
  * metadata tier directly instead of committing 50k data files.
  *
  * How: a REAL two-file table is committed through [[graft.iceberg.IcebergWriter]]
  * first (so every Avro schema, metadata.json field and path convention
  * is the engine writer's own); its manifest and manifest-list records
  * then serve as TEMPLATES that are cloned with per-manifest partition
  * values and per-entry file paths, and the snapshot's manifest list is
  * rewritten in place to reference the synthesized tier. Data files are
  * never read by planning, so the entries point at paths that do not
  * exist — every consumer here is metadata-only (loadTable,
  * `mode='list_files'`, row-count-from-stats).
  *
  * The reference eagerly loads EVERY manifest of a snapshot at bind time
  * (`common/iceberg.cpp:38-91`) — the shape this fixture exists to beat:
  * a partition-filtered first touch must decode only the matching
  * manifests (manifest-list summary pruning), and a full load must fan
  * out to executors (distributed planning) rather than serialize 1000
  * driver-side reads.
  */
object WideFixture {

  /** manifest m covers exactly day `baseDay + m` (one-day manifests with
    * disjoint summaries — the ideal pruning shape a daily-partitioned
    * append pipeline produces). */
  val BaseDate: java.time.LocalDate = java.time.LocalDate.of(2024, 1, 1)

  /** `dv = true` (r18): the seed is v3 and DML-deleted once, so the
    * snapshot carries a REAL delete manifest + puffin deletion vector;
    * the DV's `referenced_data_file` is re-pointed at the first
    * synthesized data path (`wide-0-0.parquet`, record_count 1 of a
    * cardinality-1 vector) — the wide DV-only metadata-count shape. */
  def build(spark: SparkSession, manifests: Int, entriesPer: Int,
            dv: Boolean = false): String = {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft_wide_").toString + "/wide"

    // 1. seed: a real identity(dt) table written by the engine
    val seed = Seq(
      (1L, java.sql.Date.valueOf(BaseDate.toString)),
      (2L, java.sql.Date.valueOf(BaseDate.plusDays(1).toString)))
      .toDF("id", "dt").repartition(2, col("dt"))
    graft.iceberg.IcebergWriter.write(seed, table,
      partitionBy = Seq("dt" -> "identity"),
      formatVersion = if (dv) 3 else 2)
    if (dv) graft.iceberg.IcebergWriter.delete(spark, table, col("id") === 1L)

    val conf = spark.sessionState.newHadoopConf()
    val snap = graft.iceberg.IcebergScan.selectSnapshot(
      spark, table, graft.iceberg.IcebergScan.Options())
    val listPath = new Path(snap.manifestList)
    val fs = listPath.getFileSystem(conf)

    // 2. templates: the writer's own list + entry records
    def readAll(p: Path): (Schema, Seq[GenericRecord]) = {
      val r = new DataFileReader[GenericRecord](
        new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
      try {
        val schema = r.getSchema
        val buf = Seq.newBuilder[GenericRecord]
        while (r.hasNext) buf += r.next()
        (schema, buf.result())
      } finally r.close()
    }
    val (listSchema, listRecs) = readAll(listPath)
    def contentOf(r: GenericRecord): Int =
      Option(r.get("content")).map(_.asInstanceOf[Number].intValue).getOrElse(0)
    val mfTemplate = listRecs.find(contentOf(_) == 0).get
    val deleteMfRecs = listRecs.filter(contentOf(_) == 1)
    val (entrySchema, entryRecs) = readAll(
      new Path(mfTemplate.get("manifest_path").toString))
    val entryTemplate = entryRecs.head

    def copy(s: Schema, r: GenericRecord): GenericRecord =
      GenericData.get().deepCopy(s, r)

    def writeAvro(p: Path, schema: Schema)(recs: Iterator[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      val out = fs.create(p, true)
      try {
        w.create(schema, out)
        recs.foreach(w.append)
      } finally w.close()
    }

    val baseDay = BaseDate.toEpochDay.toInt

    // 3. synthesized manifests: manifest m = entriesPer entries, all on
    // day baseDay + m
    val dataFileSchema = entrySchema.getField("data_file").schema()
    (0 until manifests).foreach { m =>
      val p = new Path(table, f"metadata/wide-m$m%05d.avro")
      writeAvro(p, entrySchema)((0 until entriesPer).iterator.map { e =>
        val rec = copy(entrySchema, entryTemplate)
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        df.put("file_path", s"$table/data/wide-$m-$e.parquet")
        df.put("record_count", 1L)
        // per-column bounds/counts are the SEED file's — null them out
        // (conservative: entry pruning then keys off the partition tuple
        // alone, which is what this fixture models)
        Seq("lower_bounds", "upper_bounds", "null_value_counts",
          "nan_value_counts", "split_offsets").foreach { f =>
          if (dataFileSchema.getField(f) != null) df.put(f, null)
        }
        val part = df.get("partition").asInstanceOf[GenericRecord]
        part.put("dt", Int.box(baseDay + m))
        rec
      })
    }

    // 3b. DV variant: re-point the real delete manifest's vector at the
    // first SYNTHESIZED data path — a cardinality-1 DV fully deleting
    // the 1-row file wide-0-0.parquet (the blob itself is untouched)
    if (dv) deleteMfRecs.foreach { mrec =>
      val mPath = new Path(mrec.get("manifest_path").toString)
      val (delSchema, delRecs) = readAll(mPath)
      writeAvro(mPath, delSchema)(delRecs.iterator.map { r =>
        val rec = copy(delSchema, r)
        rec.get("data_file").asInstanceOf[GenericRecord]
          .put("referenced_data_file", s"$table/data/wide-0-0.parquet")
        rec
      })
      mrec.put("manifest_length", fs.getFileStatus(mPath).getLen)
    }

    // 4. rewrite the manifest list in place with per-manifest summaries
    def le4(v: Int): ByteBuffer = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.flip(); b
    }
    val summarySchema = {
      val partsField = listSchema.getField("partitions").schema()
      // union ["null", array[r508]]
      val arr = partsField.getTypes.get(1)
      arr.getElementType
    }
    writeAvro(listPath, listSchema)(
      deleteMfRecs.iterator ++ (0 until manifests).iterator.map { m =>
      val p = new Path(table, f"metadata/wide-m$m%05d.avro")
      val rec = copy(listSchema, mfTemplate)
      rec.put("manifest_path", p.toString)
      rec.put("manifest_length", fs.getFileStatus(p).getLen)
      rec.put("added_data_files_count", Int.box(entriesPer))
      rec.put("existing_data_files_count", Int.box(0))
      rec.put("deleted_data_files_count", Int.box(0))
      rec.put("added_rows_count", Long.box(entriesPer.toLong))
      rec.put("existing_rows_count", Long.box(0L))
      rec.put("deleted_rows_count", Long.box(0L))
      val summary = new GenericData.Record(summarySchema)
      summary.put("contains_null", Boolean.box(false))
      summary.put("contains_nan", Boolean.box(false))
      summary.put("lower_bound", le4(baseDay + m))
      summary.put("upper_bound", le4(baseDay + m))
      val arr = new GenericData.Array[GenericRecord](
        1, listSchema.getField("partitions").schema().getTypes.get(1))
      arr.add(summary)
      rec.put("partitions", arr)
      rec
    })

    // the list file changed IN PLACE under its recorded name — drop the
    // immutable-path caches before anyone replans
    graft.iceberg.ManifestReader.invalidatePlanningCache()
    table
  }
}
