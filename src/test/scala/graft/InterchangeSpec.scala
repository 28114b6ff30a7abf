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
}
