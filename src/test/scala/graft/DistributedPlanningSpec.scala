package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, ManifestReader}
import graft.iceberg.IcebergModel.ManifestEntry

/** Distributed manifest planning: above the threshold, manifests decode
  * as a Spark job on the executors; the result must be IDENTICAL to the
  * driver-pool path (same entries, same order), and a scan planned that
  * way must read the same rows. */
class DistributedPlanningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-dist-plan").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Lineitem = "/root/reference/data/iceberg/lineitem_iceberg"
  private val moved = IcebergScan.Options(allowMovedPaths = true)

  /** Array[Byte] map values defeat case-class ==; normalize to Seqs. */
  private def norm(e: ManifestEntry) = (
    e.status, e.content, e.filePath, e.fileFormat, e.recordCount,
    e.fileSizeInBytes,
    e.partition.toSeq.sortBy(_._1).map { case (k, v) => (k, String.valueOf(v)) },
    e.lowerBounds.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toSeq) },
    e.upperBounds.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toSeq) },
    e.nullCounts.toSeq.sorted, e.equalityIds, e.sequenceNumber,
    e.referencedDataFile, e.contentOffset, e.contentSizeInBytes, e.firstRowId)

  test("executor-side manifest decode returns exactly the driver pool's entries") {
    val snapshot = IcebergScan.selectSnapshot(spark, Lineitem, moved)
    val base = spark.sessionState.newHadoopConf()

    // cache off: this test compares the two UNCACHED decode paths — a
    // cache hit on the second load would make the comparison vacuous
    val driverConf = new org.apache.hadoop.conf.Configuration(base)
    driverConf.setInt(ManifestReader.PlanningCacheSnapshotsKey, 0)
    driverConf.setInt(ManifestReader.DistributedPlanningThresholdKey, 0)
    val viaDriver = ManifestReader.loadTable(Lineitem, snapshot, driverConf, true)

    val distConf = new org.apache.hadoop.conf.Configuration(base)
    distConf.setInt(ManifestReader.PlanningCacheSnapshotsKey, 0)
    distConf.setInt(ManifestReader.DistributedPlanningThresholdKey, 1)
    val viaCluster = ManifestReader.loadTable(Lineitem, snapshot, distConf, true)

    assert(viaDriver.entries.map(_._1) === viaCluster.entries.map(_._1))
    assert(viaDriver.entries.map(_._2.map(norm)) ===
           viaCluster.entries.map(_._2.map(norm)))
    assert(viaDriver.entries.map(_._2.size).sum > 0)
  }

  test("a scan planned distributed reads the same rows (golden 51793)") {
    val key = ManifestReader.DistributedPlanningThresholdKey
    val cacheKey = ManifestReader.PlanningCacheSnapshotsKey
    spark.conf.set(key, "1")
    spark.conf.set(cacheKey, "0") // force a live distributed plan
    try {
      val cnt = IcebergScan.scan(spark, Lineitem, moved).count()
      assert(cnt === 51793L)
    } finally { spark.conf.unset(key); spark.conf.unset(cacheKey) }
  }
}
