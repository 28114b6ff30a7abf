package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergPruning, IcebergScan, ManifestReader}
import graft.queries.WideFixture

/** Planning behavior at 100 TB metadata width (round 11): a snapshot of
  * 1,000 manifests / 50,000 entries — synthesized via [[WideFixture]] —
  * must (a) decode ONLY matching manifests on a partition-filtered first
  * touch, (b) plan the full load through the DISTRIBUTED fetch with
  * entry-for-entry parity against the driver pool, and (c) keep planning
  * wall-time bounded. The reference's eager full-load at bind time
  * (`common/iceberg.cpp:38-91`) is the anti-pattern these pin against. */
class WidePlanningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[8]", "8").appName("graft-wide-plan").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Manifests = 1000
  private val EntriesPer = 50

  private lazy val table: String = WideFixture.build(spark, Manifests, EntriesPer)

  test("a partition-filtered first touch decodes 1 manifest of 1000") {
    ManifestReader.invalidatePlanningCache()
    val day = WideFixture.BaseDate.plusDays(123)
    val (d0, p0) = ManifestReader.manifestPruneStats
    val listing = IcebergScan.scanFiltered(
      spark, table, col("dt") === lit(day.toString).cast("date"),
      IcebergScan.Options(mode = "list_files"))
    val (d1, p1) = ManifestReader.manifestPruneStats
    assert(d1 - d0 === 1L, "manifests decoded")
    assert(p1 - p0 === (Manifests - 1).toLong, "manifests pruned at the LIST level")
    assert(listing.filter(col("type") === "data").count() === EntriesPer.toLong)
  }

  test("full load plans distributed with driver-pool parity and all 50k entries") {
    val base = spark.sessionState.newHadoopConf()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())

    val driverConf = new org.apache.hadoop.conf.Configuration(base)
    driverConf.setInt(ManifestReader.PlanningCacheSnapshotsKey, 0)
    driverConf.setInt(ManifestReader.DistributedPlanningThresholdKey, 0)
    val t0 = System.nanoTime()
    val viaDriver = ManifestReader.loadTable(table, snap, driverConf, false)
    val driverSec = (System.nanoTime() - t0) / 1e9

    val distConf = new org.apache.hadoop.conf.Configuration(base)
    distConf.setInt(ManifestReader.PlanningCacheSnapshotsKey, 0)
    distConf.setInt(ManifestReader.DistributedPlanningThresholdKey, 64)
    val t1 = System.nanoTime()
    val viaCluster = ManifestReader.loadTable(table, snap, distConf, false)
    val distSec = (System.nanoTime() - t1) / 1e9

    assert(viaDriver.entries.map(_._2.size).sum === Manifests * EntriesPer)
    assert(viaCluster.entries.map(_._2.size).sum === Manifests * EntriesPer)
    assert(viaDriver.entries.map(_._1.manifestPath) ===
      viaCluster.entries.map(_._1.manifestPath))
    assert(viaDriver.entries.map(_._2.map(_.filePath)) ===
      viaCluster.entries.map(_._2.map(_.filePath)))
    // wall-time bound: generous enough for CI contention, tight enough
    // that an accidentally serialized 1000-file fetch (or a per-entry
    // quadratic) fails loudly
    assert(driverSec < 30.0, s"driver-pool planning took ${driverSec}s")
    assert(distSec < 30.0, s"distributed planning took ${distSec}s")
    info(f"planning: driver-pool $driverSec%.2fs, distributed $distSec%.2fs")
  }

  test("distributed entry pruning collects ∝ survivors, not table size") {
    // Model a wide table whose manifest-list summaries CANNOT answer the
    // filter (keep-all manifestFilter = a foreign list without summaries):
    // planning must fan out, run the entry predicate ON THE EXECUTORS and
    // collect only the one matching day's entries — not all 50k.
    ManifestReader.invalidatePlanningCache()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sessionState.newHadoopConf())
    conf.setInt(ManifestReader.PlanningCacheSnapshotsKey, 0) // nothing to preserve
    conf.setInt(ManifestReader.DistributedPlanningThresholdKey, 64)
    val day = WideFixture.BaseDate.plusDays(777)
    val pred = IcebergPruning.ColPredicate(
      "dt", IcebergPruning.Eq, java.sql.Date.valueOf(day.toString))
    val (c0, p0) = ManifestReader.distributedEntryStats
    val meta = ManifestReader.loadTable(
      table, snap, conf, allowMovedPaths = false,
      entryFilter = Some(IcebergPruning.EntryPredicate(
        Seq(pred), snap.partitionSpec, snap.schema)))
    val (c1, p1) = ManifestReader.distributedEntryStats
    assert(meta.partialPlan, "a filtered distributed load is a partial plan")
    assert(meta.entries.map(_._2.size).sum === EntriesPer.toLong,
      "plan holds only the matching day's entries")
    assert(c1 - c0 === EntriesPer.toLong, "collected entries = survivors")
    assert(p1 - p0 === (Manifests.toLong * EntriesPer - EntriesPer),
      "non-matching entries dropped on the executors")
  }

  test("entry pruning bypassed when the full plan fits the cache budget") {
    // a 50k-entry table fits the default 500k-entry budget: with caching
    // ON the load must collect everything once and cache the full plan,
    // so repeated scans stay zero-I/O (the small-table fast path)
    ManifestReader.invalidatePlanningCache()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sessionState.newHadoopConf())
    conf.setInt(ManifestReader.DistributedPlanningThresholdKey, 64)
    val pred = IcebergPruning.ColPredicate(
      "dt", IcebergPruning.Eq,
      java.sql.Date.valueOf(WideFixture.BaseDate.plusDays(5).toString))
    val meta = ManifestReader.loadTable(
      table, snap, conf, allowMovedPaths = false,
      entryFilter = Some(IcebergPruning.EntryPredicate(
        Seq(pred), snap.partitionSpec, snap.schema)))
    assert(!meta.partialPlan, "budget-fitting load stays a full cached plan")
    assert(meta.entries.map(_._2.size).sum === (Manifests * EntriesPer).toLong)
  }

  test("scanFiltered drives entry pruning end-to-end over the budget") {
    // the USER path: a filtered scan whose full decode would exceed the
    // driver's entry budget must collect survivors only AND still list
    // the right files. Budget shrunk via the session's hadoop conf.
    ManifestReader.invalidatePlanningCache()
    spark.conf.set(
      "spark.hadoop." + ManifestReader.PlanningCacheMaxEntriesKey, "1000")
    try {
      val day = WideFixture.BaseDate.plusDays(321)
      val (c0, _) = ManifestReader.distributedEntryStats
      val listing = IcebergScan.scanFiltered(
        spark, table, col("dt") === lit(day.toString).cast("date"),
        IcebergScan.Options(mode = "list_files"))
      val kept = listing.filter(col("type") === "data").count()
      val (c1, _) = ManifestReader.distributedEntryStats
      assert(kept === EntriesPer.toLong)
      // manifest-level pruning already bounds THIS fixture's decode to 1
      // manifest, so the distributed path may not even engage; force the
      // scale-relevant shape: summaries that cannot answer (a range
      // filter over >64 manifests) with the small budget
      val lo = WideFixture.BaseDate.plusDays(100)
      val hi = WideFixture.BaseDate.plusDays(199)
      val listing2 = IcebergScan.scanFiltered(
        spark, table,
        col("dt") >= lit(lo.toString).cast("date") &&
          col("dt") <= lit(hi.toString).cast("date"),
        IcebergScan.Options(mode = "list_files"))
      assert(listing2.filter(col("type") === "data").count() ===
        100L * EntriesPer)
      val (c2, _) = ManifestReader.distributedEntryStats
      // the 100-manifest fetch ran distributed-and-filtered: collected
      // entries = the window's survivors, not whatever was decoded
      assert(c2 - c1 === 100L * EntriesPer,
        s"collected ${c2 - c1} entries; want survivors only (c0=$c0)")
    } finally spark.conf.unset(
      "spark.hadoop." + ManifestReader.PlanningCacheMaxEntriesKey)
  }

  test("wide-snapshot metadata aggregates collect tuple partials, not entries (round 17)") {
    // VERDICT r16 #5: a FILTERED metadata count over a snapshot whose
    // full decode would blow the driver's entry budget must fold entries
    // to per-tuple partials ON THE EXECUTORS and collect O(partition
    // tuples) — here 1000 day partials, never the 50k entries.
    ManifestReader.invalidatePlanningCache()
    // session confs land VERBATIM in sessionState.newHadoopConf(), so
    // the bare key is the one that reaches planning
    spark.conf.set(ManifestReader.PlanningCacheMaxEntriesKey, "2000")
    try {
      val df = spark.read.format("graft").load(table)
      val day = WideFixture.BaseDate.plusDays(123)
      val (e0, _) = ManifestReader.distributedEntryStats
      val t0 = ManifestReader.tupleStatsCollected
      val q = df.filter(col("dt") >= lit(day.toString).cast("date"))
        .agg(count(lit(1)).as("n"))
      val n = q.collect().head.getLong(0)
      val t1 = ManifestReader.tupleStatsCollected
      val (e1, _) = ManifestReader.distributedEntryStats
      assert(n === (Manifests - 123).toLong * EntriesPer)
      // served scan-free from the partials
      assert(PlanWalk.collect(q.queryExecution.executedPlan) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b: Any
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f: Any
      }.isEmpty, s"must serve from metadata:\n${q.queryExecution.executedPlan}")
      // the wide path engaged, collected ∝ tuples, and never shipped
      // entries to the driver
      assert(t1 - t0 > 0, "wide tuple-stats path must engage")
      assert(t1 - t0 <= 2L * Manifests,
        s"collected ${t1 - t0} partials for $Manifests partition tuples")
      assert(e1 - e0 === 0L, "no entries may reach the driver")
      // grouped shape over the same width: one row per live day
      val g0 = ManifestReader.tupleStatsCollected
      val g = df.groupBy(col("dt")).agg(count(lit(1)).as("n"))
      assert(g.collect().length === Manifests)
      assert(ManifestReader.tupleStatsCollected - g0 <= 2L * Manifests)
    } finally spark.conf.unset(ManifestReader.PlanningCacheMaxEntriesKey)
  }

  test("tuple partials: executor fold matches the driver-side fold exactly") {
    // parity pin (like the entry-fetch parity test): the distributed
    // wideTupleStats fold and MetaAgg.fold over a full driver decode
    // must agree partial-for-partial — the two paths share the fold
    // code, and this keeps them honest if either ever specializes
    ManifestReader.invalidatePlanningCache()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sessionState.newHadoopConf())
    conf.setLong(ManifestReader.PlanningCacheMaxEntriesKey, 2000L)
    val wide = ManifestReader.wideTupleStats(
      table, snap, conf, allowMovedPaths = false, Seq.empty)
    assert(wide.isDefined, "the 50k-entry fixture must take the wide path")
    val driver = graft.iceberg.MetaAgg.fold(
      ManifestReader.loadTable(table, snap,
          spark.sessionState.newHadoopConf(), allowMovedPaths = false)
        .entries.iterator.flatMap(_._2), Seq.empty)
    def keyed(ts: Seq[graft.iceberg.TupleAgg]) =
      ts.map(t => t.partition("dt") -> t.rows).toMap
    assert(keyed(wide.get) === keyed(driver))
    assert(wide.get.size === Manifests)
    assert(wide.get.map(_.rows).sum === (Manifests * EntriesPer).toLong)
  }

  test("row count serves from manifest-list stats without decoding entries") {
    ManifestReader.invalidatePlanningCache()
    val (d0, _) = ManifestReader.manifestPruneStats
    val cnt = IcebergScan.rowCount(spark, table)
      .head.getLong(0)
    assert(cnt === (Manifests * EntriesPer).toLong)
    val (d1, _) = ManifestReader.manifestPruneStats
    assert(d1 - d0 === 0L, "row count must not decode any manifest")
  }

  test("DV-only wide snapshots keep the distributed tuple fold (round 18)") {
    // a 200-manifest / 10k-entry v3 fact with ONE live deletion vector:
    // the metadata count must still fold on the EXECUTORS (collect ∝
    // tuples, zero entries to the driver) and subtract the vector's
    // cardinality from its file's tuple exactly
    val dvTable = WideFixture.build(spark, manifests = 200, entriesPer = 50,
      dv = true)
    ManifestReader.invalidatePlanningCache()
    spark.conf.set(ManifestReader.PlanningCacheMaxEntriesKey, "2000")
    try {
      val df = spark.read.format("graft").load(dvTable)
      val (e0, _) = ManifestReader.distributedEntryStats
      val t0 = ManifestReader.tupleStatsCollected
      val q = df.agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) === 200L * 50 - 1,
        "the DV's one deleted row must subtract")
      assert(PlanWalk.collect(q.queryExecution.executedPlan) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b: Any
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f: Any
      }.isEmpty, s"must serve from metadata:\n${q.queryExecution.executedPlan}")
      assert(ManifestReader.tupleStatsCollected - t0 > 0,
        "the wide tuple-stats path must engage under a DV")
      assert(ManifestReader.distributedEntryStats._1 - e0 === 0L,
        "no entries may reach the driver")
      // grouped: only day 0's tuple lost a row
      val g = df.groupBy(col("dt")).agg(count(lit(1)).as("n"))
        .orderBy(col("dt")).collect()
      assert(g.length === 200)
      assert(g.head.getLong(1) === 49L)
      assert(g.tail.forall(_.getLong(1) === 50L))
    } finally spark.conf.unset(ManifestReader.PlanningCacheMaxEntriesKey)
  }

  test("a narrow date RANGE decodes only its manifests (incremental window shape)") {
    ManifestReader.invalidatePlanningCache()
    val lo = WideFixture.BaseDate.plusDays(200)
    val hi = WideFixture.BaseDate.plusDays(209)
    val (d0, p0) = ManifestReader.manifestPruneStats
    val listing = IcebergScan.scanFiltered(
      spark, table,
      col("dt") >= lit(lo.toString).cast("date") &&
        col("dt") <= lit(hi.toString).cast("date"),
      IcebergScan.Options(mode = "list_files"))
    val kept = listing.filter(col("type") === "data").count()
    val (d1, p1) = ManifestReader.manifestPruneStats
    assert(d1 - d0 === 10L)
    assert(p1 - p0 === (Manifests - 10).toLong)
    assert(kept === 10L * EntriesPer)
  }
}
