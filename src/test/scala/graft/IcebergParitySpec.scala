package graft

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergScan
import graft.iceberg.IcebergScan.Options

/** Error-message and edge parity with the reference's sqllogictests:
  * wrong codec / missing dir / bad version format errors
  * (iceberg_snapshots.test:30-49, iceberg_metadata.test:41-49), v1 and gzip
  * metadata goldens (iceberg_metadata.test), no-hint guessing variants, and
  * the fail-loud path for equality deletes (which the reference's enum
  * defines but nothing executes — iceberg_types.hpp:45).
  */
class IcebergParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val RefData = "/root/reference/data/iceberg"
  private val Lineitem = s"$RefData/lineitem_iceberg"
  private val LineitemGz = s"$RefData/lineitem_iceberg_gz"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-parity").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val moved = Options(allowMovedPaths = true)

  test("snapshots pinned to version=1 (iceberg_snapshots.test:21-24)") {
    val rows = IcebergScan.snapshots(spark, Lineitem, Options(version = "1")).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 3776207205136740581L)
  }

  test("bad version_name_format error text (iceberg_snapshots.test:26-29)") {
    val e = intercept[java.io.IOException] {
      IcebergScan.snapshots(spark, Lineitem,
        Options(version = "1", versionNameFormat = "v%s%s.metadata.gz"))
    }
    assert(e.getMessage ===
      "Iceberg metadata file not found for table version '1' using 'none' compression and format(s): 'v%s%s.metadata.gz'")
  }

  test("missing metadata dir error text (iceberg_snapshots.test:41-44)") {
    val bogus = s"$RefData/lineitem_iceberg_nonexistent"
    val e = intercept[java.io.IOException] {
      IcebergScan.snapshots(spark, bogus)
    }
    assert(e.getMessage === s"""Cannot open "$bogus": Metadata directory does not exist""")
  }

  test("gzip table without codec errors (iceberg_snapshots.test:46-49)") {
    val e = intercept[java.io.IOException] {
      IcebergScan.snapshots(spark, LineitemGz)
    }
    assert(e.getMessage ===
      "Iceberg metadata file not found for table version '2' using 'none' compression and format(s): 'v%s%s.metadata.json,%s%s.metadata.json'")
  }

  test("gzip snapshots golden row (iceberg_snapshots.test:51-55)") {
    val rows = IcebergScan.snapshots(spark, LineitemGz,
      Options(metadataCompressionCodec = "gzip")).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 0L)
    assert(rows(0).getLong(1) === 4468019210336628573L)
    assert(rows(0).getString(3).endsWith("23f9dbea-1e7f-4694-a82c-dc3c9a94953e.avro"))
  }

  test("v1 metadata golden row (iceberg_metadata.test:25-28)") {
    val rows = IcebergScan.metadata(spark, Lineitem, moved.copy(version = "1")).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getString(0).endsWith("cf3d0be5-cf70-453d-ad8f-48fdc412e608-m0.avro"))
    assert(r.getLong(1) === 1L)
    assert(r.getString(2) === "DATA")
    assert(r.getString(3) === "ADDED")
    assert(r.getString(4) === "EXISTING")
    assert(r.getString(5).endsWith("00000-411-0792dcfe-4e25-4ca3-8ada-175286069a47-00001.parquet"))
    assert(r.getString(6) === "PARQUET")
    assert(r.getLong(7) === 60175L)
  }

  test("metadata wrong-codec + custom-format error text (iceberg_metadata.test:46-49)") {
    val e = intercept[java.io.IOException] {
      IcebergScan.metadata(spark, LineitemGz,
        moved.copy(metadataCompressionCodec = "blarg", versionNameFormat = "blat%s%s"))
    }
    assert(e.getMessage ===
      "Iceberg metadata file not found for table version '2' using 'blarg' compression and format(s): 'blat%s%s'")
  }

  test("metadata guessing gate + guessed goldens (iceberg_metadata.test:59-76)") {
    val noHint = s"$RefData/lineitem_iceberg_no_hint"
    spark.conf.unset("unsafe_enable_version_guessing")
    val e = intercept[IllegalArgumentException] {
      IcebergScan.metadata(spark, noHint, moved)
    }
    assert(e.getMessage.contains("unsafe_enable_version_guessing"))
    spark.conf.set("unsafe_enable_version_guessing", "true")
    try {
      val rows = IcebergScan.metadata(spark, noHint, moved).collect()
      assert(rows.length === 2)
      assert(rows.exists(r => r.getString(3) == "ADDED" && r.getLong(7) == 51793L))
      assert(rows.exists(r => r.getString(3) == "DELETED" && r.getLong(7) == 60175L))
    } finally spark.conf.unset("unsafe_enable_version_guessing")
  }

  test("gz_no_hint guessing with codec (iceberg_metadata.test:90-93)") {
    val gzNoHint = s"$RefData/lineitem_iceberg_gz_no_hint"
    spark.conf.set("unsafe_enable_version_guessing", "true")
    try {
      val rows = IcebergScan.metadata(spark, gzNoHint,
        moved.copy(metadataCompressionCodec = "gzip")).collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(7) === 111968L)
    } finally spark.conf.unset("unsafe_enable_version_guessing")
  }

  // ---- equality deletes fail loudly -------------------------------------

  /** Build a minimal v2 table whose snapshot carries one equality-delete
    * manifest entry. No parquet is needed — the scan must throw before any
    * data file is touched. */
  private def buildEqualityDeleteTable(): String = {
    val root = Files.createTempDirectory("graft_eqdel_").toFile
    val metaDir = new File(root, "metadata"); metaDir.mkdirs()

    val manifestSchema = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"record_count","type":"long"}]}}]}""")
    val manifestFile = new File(metaDir, "eqdel-m0.avro")
    writeAvro(manifestSchema, manifestFile) { rec =>
      val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
      df.put("content", 2) // EQUALITY_DELETES
      df.put("file_path", s"${root.getAbsolutePath}/data/eqdel.parquet")
      df.put("file_format", "PARQUET")
      df.put("record_count", 1L)
      rec.put("status", 1) // ADDED
      rec.put("data_file", df)
    }

    val listSchema = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"content","type":"int"},
        {"name":"sequence_number","type":"long"}]}""")
    val listFile = new File(metaDir, "snap-1.avro")
    writeAvro(listSchema, listFile) { rec =>
      rec.put("manifest_path", manifestFile.getAbsolutePath)
      rec.put("content", 1) // DELETE manifest
      rec.put("sequence_number", 1L)
    }

    val metadataJson = s"""{
      "format-version": 2,
      "current-schema-id": 0,
      "schemas": [{"schema-id": 0, "type": "struct", "fields": [
        {"id": 1, "name": "x", "required": false, "type": "long"}]}],
      "current-snapshot-id": 1,
      "snapshots": [{
        "snapshot-id": 1, "sequence-number": 1, "timestamp-ms": 1700000000000,
        "schema-id": 0, "manifest-list": "${listFile.getAbsolutePath}"}]
    }"""
    Files.writeString(new File(metaDir, "v1.metadata.json").toPath, metadataJson)
    Files.writeString(new File(metaDir, "version-hint.text").toPath, "1")
    root.getAbsolutePath
  }

  private def writeAvro(schema: Schema, out: File)(fill: GenericRecord => Unit): Unit = {
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, out)
    try {
      val rec = new GenericData.Record(schema)
      fill(rec)
      writer.append(rec)
    } finally writer.close()
  }

  test("scan schema matches the reference lineitem DESCRIBE golden " +
       "(iceberg_scan_generated_data_0_001.test:17-28 pattern)") {
    import org.apache.spark.sql.types._
    val schema = IcebergScan.scan(spark, Lineitem, moved).schema
    val expected = Seq(
      "l_orderkey" -> IntegerType, "l_partkey" -> IntegerType,
      "l_suppkey" -> IntegerType, "l_linenumber" -> IntegerType,
      "l_quantity" -> IntegerType,
      "l_extendedprice" -> DecimalType(15, 2),
      "l_discount" -> DecimalType(15, 2), "l_tax" -> DecimalType(15, 2),
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> DateType, "l_commitdate" -> DateType,
      "l_receiptdate" -> DateType, "l_shipinstruct" -> StringType,
      "l_shipmode" -> StringType, "l_comment" -> StringType)
    assert(schema.fields.map(f => f.name -> f.dataType).toSeq === expected)
    assert(schema.fields.forall(_.nullable)) // all required:false in metadata
  }

  test("incremental append between snapshots returns only the added file's rows") {
    val inc = IcebergScan.incrementalAppend(
      spark, Lineitem, fromSnapshotId = 3776207205136740581L, opts = moved)
    assert(inc.count() === 51793L)
    // from == to → empty increment with the table schema
    val none = IcebergScan.incrementalAppend(
      spark, Lineitem, fromSnapshotId = 7635660646343998149L,
      toSnapshotId = Some(7635660646343998149L), opts = moved)
    assert(none.count() === 0L)
    assert(none.columns.contains("l_orderkey"))
  }

  test("scan works with explicit file:// scheme paths (the S3-shape path bridge)") {
    // The MoR delete anti-join bridges manifest path strings to Spark's
    // fully-qualified _metadata.file_path URIs; an explicit scheme on the
    // table path exercises exactly the qualification code that a remote
    // (s3a://) deployment would hit.
    val gen = s"file://$RefData/generated_spec2_0_001/pyspark_iceberg_table"
    val got = IcebergScan.scan(spark, gen, moved)
    assert(got.count() === 6592L)
  }

  test("live equality deletes fail loudly instead of corrupting results") {
    val table = buildEqualityDeleteTable()
    val e = intercept[UnsupportedOperationException] {
      IcebergScan.scan(spark, table)
    }
    assert(e.getMessage.contains("equality deletes are not supported"))
  }
}
