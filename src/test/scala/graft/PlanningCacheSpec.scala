package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter, ManifestReader}

/** Snapshot-keyed planning cache: snapshots are immutable, so the
  * manifest-list + manifest decode for a (table, snapshot) pair is
  * reusable across queries with no invalidation protocol. Interactive
  * use on a 100k-entry table pays planning I/O ONCE per snapshot, not
  * per query; a new commit is a new snapshot id and manifest-list file
  * name, which misses by construction (freshness needs no TTL). */
class PlanningCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-plan-cache").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idsDF(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id").withColumn("label", concat(lit("row-"), col("id")))
  }

  test("a repeated scan replans from the cache — the manifest list is not re-read") {
    val table = tmp("graft_pcache_hit_") + "/t"
    IcebergWriter.write(idsDF(1L to 20L: _*), table)
    assert(IcebergScan.scan(spark, table).count() === 20)

    // proof of no re-read: remove the manifest-list and manifest files
    // from storage; only a cached plan can still serve the scan
    val conf = spark.sessionState.newHadoopConf()
    val metaDir = new org.apache.hadoop.fs.Path(table, "metadata")
    val fs = metaDir.getFileSystem(conf)
    val moved = new org.apache.hadoop.fs.Path(tmp("graft_pcache_stash_"))
    val avros = fs.listStatus(metaDir)
      .filter(_.getPath.getName.endsWith(".avro")).map(_.getPath)
    assert(avros.nonEmpty)
    avros.foreach(p => fs.rename(p, new org.apache.hadoop.fs.Path(moved, p.getName)))
    try {
      val (h0, _) = ManifestReader.planningCacheStats
      assert(IcebergScan.scan(spark, table).count() === 20)
      val (h1, _) = ManifestReader.planningCacheStats
      assert(h1 > h0, "second scan did not hit the planning cache")
    } finally {
      // restore for any later maintenance over the temp dir
      avros.foreach(p =>
        fs.rename(new org.apache.hadoop.fs.Path(moved, p.getName), p))
    }
  }

  test("a new commit misses the cache — fresh data is always visible") {
    val table = tmp("graft_pcache_fresh_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3), table)
    assert(IcebergScan.scan(spark, table).count() === 3)
    IcebergWriter.write(idsDF(4, 5), table)
    assert(IcebergScan.scan(spark, table).count() === 5)
    // MoR delete: new snapshot again, tombstones must apply
    IcebergWriter.delete(spark, table, col("id") === 1)
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(2L, 3L, 4L, 5L))
  }

  test("time travel caches per snapshot id, not per table") {
    val table = tmp("graft_pcache_tt_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)
    IcebergWriter.write(idsDF(3), table)
    val snaps = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect().map(_.getAs[Long]("snapshot_id"))
    assert(snaps.length === 2)
    // interleave: each (table, snapshot) plan is its own cache row
    for (_ <- 1 to 2) {
      assert(IcebergScan.scan(spark, table,
        IcebergScan.Options(snapshotId = Some(snaps(0)))).count() === 2)
      assert(IcebergScan.scan(spark, table,
        IcebergScan.Options(snapshotId = Some(snaps(1)))).count() === 3)
    }
  }

  test("planningCacheSnapshots=0 disables the cache") {
    val table = tmp("graft_pcache_off_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3, 4), table)
    spark.conf.set(ManifestReader.PlanningCacheSnapshotsKey, "0")
    try {
      val (h0, m0) = ManifestReader.planningCacheStats
      assert(IcebergScan.scan(spark, table).count() === 4)
      assert(IcebergScan.scan(spark, table).count() === 4)
      val (h1, m1) = ManifestReader.planningCacheStats
      assert(h1 === h0 && m1 === m0,
        "disabled cache must record neither hits nor misses")
    } finally spark.conf.unset(ManifestReader.PlanningCacheSnapshotsKey)
  }

  test("the cache is LRU-bounded (old snapshots evict, correctness holds)") {
    val table = tmp("graft_pcache_lru_") + "/t"
    IcebergWriter.write(idsDF(1), table)
    spark.conf.set(ManifestReader.PlanningCacheSnapshotsKey, "2")
    try {
      // 3 distinct snapshots cycle through a 2-slot cache
      IcebergWriter.write(idsDF(2), table)
      IcebergWriter.write(idsDF(3), table)
      val snaps = IcebergScan.snapshots(spark, table)
        .orderBy("sequence_number").collect().map(_.getAs[Long]("snapshot_id"))
      for (_ <- 1 to 2; (s, i) <- snaps.zipWithIndex) {
        assert(IcebergScan.scan(spark, table,
          IcebergScan.Options(snapshotId = Some(s))).count() === i + 1)
      }
    } finally spark.conf.unset(ManifestReader.PlanningCacheSnapshotsKey)
  }
}
