package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** User-callable maintenance actions: `rewriteManifests` (forced manifest
  * compaction) and `removeOrphanFiles` (age-gated vacuum). */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-maintenance").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idsDF(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id").withColumn("payload", concat(lit("p-"), col("id")))
  }

  test("rewriteManifests merges planning metadata without touching data") {
    val table = tmp("graft_rw_manifests_") + "/t"
    (1L to 5L).foreach(i => IcebergWriter.write(idsDF(i), table))
    val before = IcebergScan.manifests(spark, table)
    assert(before.count() === 5)
    val preSnapshot = IcebergScan.snapshots(spark, table)
      .agg(max("snapshot_id")).head().getLong(0)

    val id = IcebergWriter.rewriteManifests(spark, table)
    assert(id.nonEmpty)
    // one data manifest, all five files carried with their original seqs
    val after = IcebergScan.manifests(spark, table).collect()
    assert(after.length === 1)
    assert(after.head.getAs[Long]("existing_files_count") === 5)
    assert(IcebergScan.scan(spark, table).count() === 5)
    // rewrote metadata only: no data file added or removed
    assert(IcebergScan.files(spark, table).count() === 5)
    // time travel to the pre-rewrite snapshot still plans under its tree
    assert(IcebergScan.scan(spark, table,
      IcebergScan.Options(snapshotId = Some(preSnapshot))).count() === 5)
    // a replace commit is invisible to the changelog
    assert(IcebergScan.changelog(spark, table, preSnapshot, None).count() === 0)
    // idempotent: a second call has nothing to merge
    assert(IcebergWriter.rewriteManifests(spark, table).isEmpty)
  }

  test("incremental reads keep their sequence windows across a manifest rewrite") {
    val table = tmp("graft_rw_incr_") + "/t"
    (1L to 4L).foreach(i => IcebergWriter.write(idsDF(i), table))
    val second = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect()(1).getAs[Long]("snapshot_id")
    IcebergWriter.rewriteManifests(spark, table)
    // appends AFTER snapshot 2 = ids 3, 4; explicit seqs must survive
    val inc = IcebergScan.incrementalAppend(spark, table, second)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inc === Set(3L, 4L))
  }

  test("removeOrphanFiles deletes only aged-out unreferenced files") {
    val table = tmp("graft_vacuum_") + "/t"
    (1L to 3L).foreach(i => IcebergWriter.write(idsDF(i), table))
    IcebergWriter.compact(spark, table)
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    val orphans = IcebergWriter.listOrphanFiles(spark, table).collect()
    assert(orphans.nonEmpty)

    // age gate: a cutoff in the past deletes nothing (in-flight-commit rail)
    assert(IcebergWriter.removeOrphanFiles(spark, table, olderThanMs = 0L)
      .count() === 0)
    assert(IcebergWriter.listOrphanFiles(spark, table).count() === orphans.length)

    // dry run reports candidates without deleting
    val future = System.currentTimeMillis() + 3600L * 1000
    val dry = IcebergWriter.removeOrphanFiles(spark, table, future, dryRun = true)
    assert(dry.count() === orphans.length)
    assert(IcebergWriter.listOrphanFiles(spark, table).count() === orphans.length)

    // the real vacuum: orphans gone, live table intact
    val removed = IcebergWriter.removeOrphanFiles(spark, table, future)
    assert(removed.collect().map(_.getString(0)).toSet ===
           orphans.map(_.getString(0)).toSet)
    assert(IcebergWriter.listOrphanFiles(spark, table).count() === 0)
    assert(IcebergScan.scan(spark, table).count() === 3)
  }
}
