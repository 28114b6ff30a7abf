package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergScan
import graft.iceberg.IcebergScan.Options

/** Golden assertions ported from the reference's sqllogictests
  * (test/sql/iceberg_scan.test, iceberg_snapshots.test, iceberg_metadata.test)
  * against the checked-in tables under /root/reference/data/iceberg.
  */
class IcebergScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val RefData = "/root/reference/data/iceberg"
  private val Lineitem = s"$RefData/lineitem_iceberg"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val moved = Options(allowMovedPaths = true)

  test("scan latest snapshot counts 51793 rows (iceberg_scan.test:18)") {
    assert(IcebergScan.scan(spark, Lineitem, moved).count() === 51793L)
  }

  test("time travel by snapshot id (iceberg_scan.test:24,30)") {
    assert(IcebergScan.scan(spark, Lineitem,
      moved.copy(snapshotId = Some(3776207205136740581L))).count() === 60175L)
    assert(IcebergScan.scan(spark, Lineitem,
      moved.copy(snapshotId = Some(7635660646343998149L))).count() === 51793L)
  }

  test("time travel by version (iceberg_scan.test:45-57)") {
    assert(IcebergScan.scan(spark, Lineitem, moved.copy(version = "1")).count() === 60175L)
    assert(IcebergScan.scan(spark, Lineitem, moved.copy(version = "2")).count() === 51793L)
  }

  test("time travel by timestamp (iceberg_scan.test:40-62)") {
    def tsMs(s: String): Long = java.time.LocalDateTime.parse(s)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    assert(IcebergScan.scan(spark, Lineitem,
      moved.copy(asOfTimestampMs = Some(tsMs("2023-02-15T15:07:54.504")))).count() === 60175L)
    assert(IcebergScan.scan(spark, Lineitem,
      moved.copy(asOfTimestampMs = Some(tsMs("2023-02-15T15:08:14.730")))).count() === 51793L)
    val err = intercept[java.io.IOException] {
      IcebergScan.scan(spark, Lineitem,
        moved.copy(asOfTimestampMs = Some(tsMs("2000-01-01T00:00:00"))))
    }
    assert(err.getMessage.contains("Could not find latest snapshots for timestamp"))
  }

  test("gzip metadata codec (iceberg_scan.test:69-72)") {
    val gz = s"$RefData/lineitem_iceberg_gz"
    assert(IcebergScan.scan(spark, gz,
      moved.copy(metadataCompressionCodec = "gzip")).count() === 111968L)
  }

  test("version guessing is gated (iceberg_scan.test:84-95)") {
    val noHint = s"$RefData/lineitem_iceberg_no_hint"
    spark.conf.unset("unsafe_enable_version_guessing")
    val err = intercept[IllegalArgumentException] {
      IcebergScan.scan(spark, noHint, moved)
    }
    assert(err.getMessage.contains("version-hint"))
    spark.conf.set("unsafe_enable_version_guessing", "true")
    try assert(IcebergScan.scan(spark, noHint, moved).count() === 51793L)
    finally spark.conf.unset("unsafe_enable_version_guessing")
  }

  test("snapshots listing golden rows (iceberg_snapshots.test:15-19)") {
    val rows = IcebergScan.snapshots(spark, Lineitem)
      .orderBy("sequence_number").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getLong(1) === 3776207205136740581L)
    assert(rows(0).getString(3).endsWith("cf3d0be5-cf70-453d-ad8f-48fdc412e608.avro"))
    assert(rows(1).getLong(0) === 2L)
    assert(rows(1).getLong(1) === 7635660646343998149L)
  }

  test("metadata listing golden rows (iceberg_metadata.test:13-22)") {
    val rows = IcebergScan.metadata(spark, Lineitem, moved)
      .orderBy("record_count").collect()
    assert(rows.length === 2)
    // latest snapshot: one ADDED 51793-row data file, one DELETED 60175-row file
    assert(rows.exists(r => r.getString(3) == "ADDED" && r.getLong(7) == 51793L))
    assert(rows.exists(r => r.getString(3) == "DELETED" && r.getLong(7) == 60175L))
  }

  test("list_files mode (iceberg_scan.cpp:66-100)") {
    val rows = IcebergScan.scan(spark, Lineitem, moved.copy(mode = "list_files")).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1) == "data"))
  }

  test("TPC-H Q6 revenue golden value (data/iceberg/lineitem_iceberg/README.md:14-17)") {
    import org.apache.spark.sql.functions._
    val df = IcebergScan.scan(spark, Lineitem, moved)
    val rev = df
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("date") &&
              col("l_shipdate") < lit("1995-01-01").cast("date") &&
              col("l_discount").between(java.math.BigDecimal.valueOf(0.05), java.math.BigDecimal.valueOf(0.07)) &&
              col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
      .collect()(0).getDecimal(0)
    assert(rev.compareTo(new java.math.BigDecimal("1077536.9101")) === 0)
  }

  test("merge-on-read position deletes: full row equality vs Spark-written oracle") {
    val gen = s"$RefData/generated_spec2_0_001/pyspark_iceberg_table"
    val expectedDir = s"$RefData/generated_spec2_0_001/expected_results/last/data"
    val got = IcebergScan.scan(spark, gen, moved)
    val expected = spark.read.parquet(expectedDir).select(got.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("CAST(ts AS DATE) predicates file-prune the filtered scan (extractPredicates)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft_castdate_").toString + "/t"
    // 4 days × 24 hourly rows, one file per day(ts) partition
    val src = spark.range(0, 96).select(
      col("id").as("k"),
      expr("timestampadd(HOUR, CAST(id AS INT), TIMESTAMP_NTZ'2024-03-01 00:00:00')")
        .as("ts"))
    graft.iceberg.IcebergWriter.write(src, table, partitionBy = Seq("ts" -> "day"))
    def files(cond: String): Long =
      IcebergScan.scanFiltered(spark, table,
        org.apache.spark.sql.functions.expr(cond),
        Options(mode = "list_files"))
        .filter(col("type") === "data").count()
    val all = files("true")
    assert(all === 4L)
    assert(files("CAST(ts AS DATE) = DATE'2024-03-02'") === 1L)
    assert(files("CAST(ts AS DATE) BETWEEN DATE'2024-03-02' AND DATE'2024-03-03'") === 2L)
    assert(files("CAST(ts AS DATE) > DATE'2024-03-03'") === 1L)
    // and the rewritten range is EXACT: rows still filter correctly
    val n = IcebergScan.scanFiltered(spark, table,
      expr("CAST(ts AS DATE) = DATE'2024-03-02'")).count()
    assert(n === 24L)
  }

  test("schema evolution: added col absent at v6, INT at v8, BIGINT at v9 " +
       "(iceberg_scan_generated_data_0_001.test:92-108)") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val gen = s"$RefData/generated_spec2_0_001/pyspark_iceberg_table"
    val v6 = IcebergScan.scan(spark, gen, moved.copy(version = "6"))
    assert(!v6.columns.contains("schema_evol_added_col_1"))
    val v8 = IcebergScan.scan(spark, gen, moved.copy(version = "8"))
    assert(v8.schema("schema_evol_added_col_1").dataType === IntegerType)
    val v9 = IcebergScan.scan(spark, gen, moved.copy(version = "9"))
    assert(v9.schema("schema_evol_added_col_1").dataType === LongType)
    // the widened column is readable (old files store INT32, schema says BIGINT)
    assert(v9.agg(org.apache.spark.sql.functions.sum("schema_evol_added_col_1")).collect()(0).get(0) != null)
  }
}
