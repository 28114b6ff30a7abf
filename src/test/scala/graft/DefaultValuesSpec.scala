package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Spec-v3 DEFAULT VALUES: metadata-only addColumn with initial-default
  * (old files read it; new files' stored values — including genuine
  * nulls — win) and write-default (appends may omit the trailing
  * column). */
class DefaultValuesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-defaults")
      .getOrCreate()

  private lazy val orders = Tables.load(spark, Sf, "orders")
  private lazy val keys: Array[Long] =
    orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
  private def firstN(n: Int) = orders.filter(col("o_orderkey") <= keys(n - 1))
  private def slice(from: Int, until: Int) = orders.filter(
    col("o_orderkey") > keys(from - 1) && col("o_orderkey") <= keys(until - 1))

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("initial-default fills pre-add rows; stored values and nulls win") {
    val table = newTable("graft_dv_def1_")
    IcebergWriter.write(firstN(200), table, formatVersion = 3)
    val snap1 = IcebergScan.snapshots(spark, table)
      .select("snapshot_id").head.getLong(0)
    IcebergWriter.addColumn(spark, table, "tier", StringType,
      initialDefault = Some("legacy"), writeDefault = Some("standard"))

    // metadata-only: old rows immediately read the initial-default
    val s1 = IcebergScan.scan(spark, table)
    assert(s1.schema.fieldNames.contains("tier"))
    assert(s1.filter(col("tier") === "legacy").count() === 200)

    // append WITH the column, including genuine nulls — stored values win
    val withTier = slice(200, 300).withColumn("tier",
      when(col("o_orderkey") % 2 === 0, lit("gold")).otherwise(lit(null: String)))
    IcebergWriter.write(withTier, table)
    val s2 = IcebergScan.scan(spark, table)
    assert(s2.filter(col("tier") === "legacy").count() === 200)
    assert(s2.filter(col("tier") === "gold").count() ===
      withTier.filter(col("tier") === "gold").count())
    // genuine nulls from the post-add file are NOT masked by the default
    assert(s2.filter(col("tier").isNull).count() ===
      withTier.filter(col("tier").isNull).count())

    // time travel to the pre-add snapshot: the column does not exist
    assert(!IcebergScan.scan(spark, table, Options(snapshotId = Some(snap1)))
      .schema.fieldNames.contains("tier"))
  }

  test("write-default fills appends that omit the trailing column") {
    val table = newTable("graft_dv_def2_")
    IcebergWriter.write(firstN(100), table, formatVersion = 3)
    IcebergWriter.addColumn(spark, table, "source", StringType,
      initialDefault = Some("backfill"), writeDefault = Some("pipeline-v1"))
    // the OLD pipeline keeps appending the old schema — writer fills
    IcebergWriter.write(slice(100, 150), table)
    val s = IcebergScan.scan(spark, table)
    assert(s.filter(col("source") === "backfill").count() === 100)
    assert(s.filter(col("source") === "pipeline-v1").count() === 50)
  }

  test("compaction materializes resolved defaults; non-string types work") {
    val table = newTable("graft_dv_def3_")
    IcebergWriter.write(firstN(150), table, formatVersion = 3)
    IcebergWriter.addColumn(spark, table, "score", IntegerType,
      initialDefault = Some(42), writeDefault = Some(0))
    IcebergWriter.addColumn(spark, table, "rate",
      DecimalType(10, 2), initialDefault = Some(new java.math.BigDecimal("9.99")),
      writeDefault = Some(new java.math.BigDecimal("1.00")))
    IcebergWriter.addColumn(spark, table, "since", DateType,
      initialDefault = Some(java.time.LocalDate.parse("2020-01-01")),
      writeDefault = Some(java.time.LocalDate.parse("2024-06-01")))
    IcebergWriter.delete(spark, table, col("o_orderkey") <= keys(49))
    IcebergWriter.compact(spark, table)
    // the compacted files STORE the resolved defaults (their entries are
    // newer than the add, so nothing re-applies them at read time)
    val s = IcebergScan.scan(spark, table)
    assert(s.count() === 100)
    assert(s.filter(col("score") === 42).count() === 100)
    assert(s.filter(col("rate") === new java.math.BigDecimal("9.99")).count() === 100)
    assert(s.filter(col("since") === lit("2020-01-01").cast("date")).count() === 100)
    // and a fresh append draws write-defaults, not initial-defaults
    IcebergWriter.write(slice(150, 170), table)
    assert(IcebergScan.scan(spark, table)
      .filter(col("score") === 0).count() === 20)
  }

  test("defaults survive a later schema-evolving append") {
    val table = newTable("graft_dv_def4_")
    IcebergWriter.write(firstN(80), table, formatVersion = 3)
    IcebergWriter.addColumn(spark, table, "lang", StringType,
      initialDefault = Some("en"), writeDefault = Some("en"))
    // append that ADDS yet another column (schema evolves again) while
    // carrying lang explicitly — the lang defaults must carry forward
    val evolved = slice(80, 120)
      .withColumn("lang", lit("de"))
      .withColumn("extra", lit(7L))
    IcebergWriter.write(evolved, table)
    val s = IcebergScan.scan(spark, table)
    assert(s.filter(col("lang") === "en").count() === 80) // initial-default intact
    assert(s.filter(col("lang") === "de").count() === 40)
    // the old pipeline (neither lang nor extra): both write-defaults?
    // extra has none — so the omission must FAIL, not silently null-fill
    intercept[IllegalArgumentException] {
      IcebergWriter.write(slice(120, 130), table)
    }
  }
}
