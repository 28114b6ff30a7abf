package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergIO, IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Writer interchange (VERDICT r3 #9): tables written by IcebergWriter
  * must be readable by OTHER Iceberg readers, not just our own scan. The
  * sandbox has no second engine (DuckDB's iceberg extension needs network
  * install), so this pins the two interchange contracts directly:
  *
  *  1. Manifests decode under the REFERENCE'S exact partial Avro reader
  *     schemas (iceberg_types.hpp:122-155) via Avro schema resolution —
  *     the identical mechanism avro-cpp uses, so a decode here proves the
  *     reference's read path would accept the files.
  *  2. metadata.json carries every field the Iceberg v2 spec requires
  *     and the reference's parser consumes (common/iceberg.cpp:93-131,
  *     230-254), including partition-specs and snapshot lineage.
  */
class InterchangeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-interchange").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // The reference's partial manifest-entry reader schema, verbatim shape
  // (iceberg_types.hpp MANIFEST_ENTRY_SCHEMA).
  private val refEntrySchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int"},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  // The reference's partial manifest-list reader schema
  // (iceberg_types.hpp MANIFEST_FILE_SCHEMA, v2).
  private val refListSchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"}]}""")

  private def decodeWith(path: String, readerSchema: Schema): Seq[GenericRecord] = {
    val conf = spark.sessionState.newHadoopConf()
    val bytes = IcebergIO.readBytes(path, conf)
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](null, readerSchema))
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.result()
    } finally reader.close()
  }

  test("written manifests decode under the reference's partial reader schemas") {
    val table = Files.createTempDirectory("graft_ix_").toString + "/t"
    val events = Tables.events(spark, Sf)
      .withColumn("dt", to_date(col("ts")))
      .repartition(col("dt"))
    IcebergWriter.write(events, table, partitionBy = Seq("dt" -> "day"))
    IcebergWriter.write(events.limit(100), table, partitionBy = Seq("dt" -> "day"))

    val conf = spark.sessionState.newHadoopConf()
    val meta = mapper.readTree(IcebergIO.readString(s"$table/metadata/v2.metadata.json", conf))
    val listPath = meta.get("snapshots").get(1).get("manifest-list").asText

    // manifest list under the reference's partial schema
    val manifests = decodeWith(listPath, refListSchema)
    assert(manifests.nonEmpty)
    assert(manifests.forall(_.get("sequence_number").asInstanceOf[Long] > 0))

    // every manifest under the reference's partial entry schema — the
    // partition/bounds extensions must not break schema resolution
    val entries = manifests.flatMap(m =>
      decodeWith(m.get("manifest_path").toString, refEntrySchema))
    assert(entries.nonEmpty)
    val total = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
    assert(total === events.count() + 100)
    assert(entries.forall { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_format").toString == "PARQUET" && df.get("content") == 0
    })
  }

  test("written metadata.json carries the spec-required interchange fields") {
    val table = Files.createTempDirectory("graft_ix2_").toString + "/t"
    val nation = Tables.load(spark, Sf, "nation")
    val snap1 = IcebergWriter.write(nation, table)
    val snap2 = IcebergWriter.write(nation, table)

    val conf = spark.sessionState.newHadoopConf()
    val root = mapper.readTree(IcebergIO.readString(s"$table/metadata/v2.metadata.json", conf))

    for (field <- Seq("format-version", "table-uuid", "location",
        "last-sequence-number", "last-updated-ms", "last-column-id",
        "current-schema-id", "schemas", "partition-specs", "default-spec-id",
        "last-partition-id", "sort-orders", "default-sort-order-id",
        "current-snapshot-id", "snapshots"))
      assert(root.has(field), s"metadata.json missing '$field'")

    assert(root.get("format-version").asInt === 2)
    assert(root.get("current-snapshot-id").asLong === snap2)

    // uuid is stable across commits (a catalog identity, not per-commit)
    val v1 = mapper.readTree(IcebergIO.readString(s"$table/metadata/v1.metadata.json", conf))
    assert(v1.get("table-uuid").asText === root.get("table-uuid").asText)

    // snapshot lineage: second snapshot points at its parent
    val snaps = root.get("snapshots")
    assert(snaps.size === 2)
    val second = snaps.get(1)
    // round 10: standard TOTAL summary metrics from manifest-list stats
    assert(second.get("summary").get("total-records").asText.toLong ===
      2 * Tables.load(spark, Sf, "nation").count())
    assert(second.get("summary").get("total-data-files").asText.toLong >= 2)
    assert(second.get("summary").get("total-delete-files").asText === "0")
    assert(second.get("snapshot-id").asLong === snap2)
    assert(second.get("parent-snapshot-id").asLong === snap1)
    assert(second.get("summary").get("operation").asText === "append")
    // standard summary stats external tools read to size incremental work
    assert(second.get("summary").get("added-records").asText.toLong ===
      Tables.load(spark, Sf, "nation").count())
    assert(second.get("summary").get("added-data-files").asText.toLong >= 1)
    // refs present with main at the current head
    assert(root.get("refs").get("main").get("snapshot-id").asLong === snap2)
    assert(second.has("sequence-number") && second.has("timestamp-ms") &&
           second.has("manifest-list") && second.has("schema-id"))

    // the scan still reads its own interchange-grade output
    assert(IcebergScan.scan(spark, table).count() === 2 * nation.count())
  }

  // ---- round 10: FULL-schema interchange -----------------------------------

  /** The reference's FULL manifest-list reader schema, transcribed from
    * its codegen (avro_codegen/iceberg_manifest_file_full.hpp:118-133,
    * r508 :85-99) with NO field defaults: Avro schema resolution then
    * REFUSES any writer record missing one of these fields, so a
    * successful decode proves the writer emitted every v2-required field
    * (rounds ≤9's 3-field lists fail this read). */
  private val refFullListSchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"partition_spec_id","type":"int"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"},
      {"name":"min_sequence_number","type":"long"},
      {"name":"added_snapshot_id","type":"long"},
      {"name":"added_data_files_count","type":"int"},
      {"name":"existing_data_files_count","type":"int"},
      {"name":"deleted_data_files_count","type":"int"},
      {"name":"added_rows_count","type":"long"},
      {"name":"existing_rows_count","type":"long"},
      {"name":"deleted_rows_count","type":"long"},
      {"name":"partitions","type":["null",{"type":"array","items":
        {"type":"record","name":"r508","fields":[
          {"name":"contains_null","type":"boolean"},
          {"name":"contains_nan","type":["null","boolean"]},
          {"name":"lower_bound","type":["null","bytes"]},
          {"name":"upper_bound","type":["null","bytes"]}]}}]}]}""")

  /** The reference's FULL manifest-entry reader schema
    * (iceberg_manifest_entry_full.hpp:306-366): spec-REQUIRED data_file
    * fields carry NO default (content, file_path, file_format, partition,
    * record_count, file_size_in_bytes — partition typed per the fixture's
    * spec), while spec-OPTIONAL fields default to null, exactly the
    * resolution posture a real foreign reader takes. The distinct
    * k126_v127/k129_v130 item record names match the codec — Avro
    * resolves records BY NAME, so a writer sharing one name across both
    * bounds maps fails here. */
  private def refFullEntrySchema(partitionFields: String): Schema =
    new Schema.Parser().parse(s"""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"snapshot_id","type":["null","long"],"default":null},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int"},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"partition","type":{"type":"record","name":"r102","fields":[$partitionFields]}},
        {"name":"record_count","type":"long"},
        {"name":"file_size_in_bytes","type":"long"},
        {"name":"column_sizes","type":["null",{"type":"array","items":
          {"type":"record","name":"k117_v118","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"long"}]}}],"default":null},
        {"name":"value_counts","type":["null",{"type":"array","items":
          {"type":"record","name":"k119_v120","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"long"}]}}],"default":null},
        {"name":"null_value_counts","type":["null",{"type":"array","items":
          {"type":"record","name":"k121_v122","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"long"}]}}],"default":null},
        {"name":"nan_value_counts","type":["null",{"type":"array","items":
          {"type":"record","name":"k138_v139","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"long"}]}}],"default":null},
        {"name":"lower_bounds","type":["null",{"type":"array","items":
          {"type":"record","name":"k126_v127","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
        {"name":"upper_bounds","type":["null",{"type":"array","items":
          {"type":"record","name":"k129_v130","fields":[
            {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
        {"name":"key_metadata","type":["null","bytes"],"default":null},
        {"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"default":null},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
        {"name":"sort_order_id","type":["null","int"],"default":null}
      ]}}]}""")

  test("written metadata decodes under the reference's FULL no-default schemas") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ix_full_").toString
    val conf = spark.sessionState.newHadoopConf()

    // partitioned fixture, 2 commits (one carried manifest), with deletes
    // so a DELETE-content manifest rides the list too
    val pt = s"$dir/pt"
    val df = (1 to 40).map(i => (i % 4, i.toLong, s"r$i")).toDF("grp", "id", "v")
    IcebergWriter.write(df, pt, partitionBy = Seq("grp" -> "identity"))
    IcebergWriter.write(df.filter(col("id") <= 10), pt,
      partitionBy = Seq("grp" -> "identity"))
    IcebergWriter.delete(spark, pt, col("id") === 3L)
    // unpartitioned fixture: r102 must still be PRESENT (empty record)
    val ut = s"$dir/ut"
    IcebergWriter.write(df.select("id", "v"), ut)

    def listOf(table: String): String =
      IcebergScan.selectSnapshot(spark, table, Options()).manifestList

    for ((table, partFields) <- Seq(
        pt -> """{"name":"grp","type":["null","int"],"default":null}""",
        ut -> "")) {
      val manifests = decodeWith(listOf(table), refFullListSchema)
      assert(manifests.nonEmpty)
      manifests.foreach { m =>
        assert(m.get("manifest_length").asInstanceOf[Long] > 0)
        assert(m.get("added_snapshot_id").asInstanceOf[Long] > 0)
        assert(m.get("added_data_files_count").asInstanceOf[Int] >= 1)
      }
      val entrySchema = refFullEntrySchema(partFields)
      val entries = manifests.flatMap(m =>
        decodeWith(m.get("manifest_path").toString, entrySchema))
      assert(entries.nonEmpty)
      entries.foreach { e =>
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        assert(d.get("partition").isInstanceOf[GenericRecord],
          "partition (spec field 102) must be present and non-null")
        assert(d.get("record_count").asInstanceOf[Long] >= 0)
        assert(d.get("file_size_in_bytes").asInstanceOf[Long] > 0)
      }
      // list-level counts agree with the decoded entries
      val fromList = manifests.map(m =>
        (m.get("added_rows_count").asInstanceOf[Long],
         m.get("existing_rows_count").asInstanceOf[Long])).map(t => t._1 + t._2).sum
      val fromEntries = entries.filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").asInstanceOf[Long]).sum
      assert(fromList === fromEntries)
    }

    // regression direction: the ROUND-9 partial list shape must FAIL this
    // reader — proving the test is red on the old writer, not vacuous
    val legacy = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"content","type":"int"},
        {"name":"sequence_number","type":"long"}]}""")
    val listPath = new org.apache.hadoop.fs.Path(listOf(ut))
    val fullRecs = decodeWith(listPath.toString, null)
    val fs = listPath.getFileSystem(conf)
    val legacyPath = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft_ix_legacy_").toString, "legacy-list.avro")
    val os = fs.create(legacyPath, true)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](legacy))
    w.create(legacy, os)
    try fullRecs.foreach { r =>
      val rec = new org.apache.avro.generic.GenericData.Record(legacy)
      rec.put("manifest_path", r.get("manifest_path").toString)
      rec.put("content", r.get("content"))
      rec.put("sequence_number", r.get("sequence_number"))
      w.append(rec)
    } finally w.close()
    val err = intercept[org.apache.avro.AvroTypeException] {
      decodeWith(legacyPath.toString, refFullListSchema)
    }
    assert(err.getMessage.contains("manifest_length") ||
      err.getMessage.toLowerCase.contains("missing"), err.getMessage)
  }
}
