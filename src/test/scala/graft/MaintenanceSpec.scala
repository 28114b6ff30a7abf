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

  test("rewritePositionDeleteFiles consolidates delete files and drops dangling rows") {
    import org.apache.spark.sql.functions.col
    import graft.iceberg.IcebergScan.Options
    import graft.iceberg.IcebergPruning
    val table = tmp("graft_rpd_") + "/t"
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, s"d${i % 3}", s"v$i")).toDF("id", "dt", "v")
    IcebergWriter.write(df.repartition(3, col("dt")), table,
      partitionBy = Seq("dt" -> "identity"))
    // three separate delete commits -> three small delete files
    IcebergWriter.delete(spark, table, col("id") % 10 === 0)
    IcebergWriter.delete(spark, table, col("id") % 10 === 1)
    IcebergWriter.delete(spark, table, col("id") % 10 === 2)
    val expect = IcebergScan.scan(spark, table).collect().map(_.toSeq).toSet
    assert(IcebergScan.positionDeletes(spark, table).count() === 18)
    val delFilesBefore = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "delete").count()
    assert(delFilesBefore >= 3)

    // overwrite partition d1: its data files die, their tombstones dangle
    IcebergWriter.overwritePartitions(
      df.filter(col("dt") === "d1").withColumn("v", org.apache.spark.sql.functions.lit("new")),
      table)

    val snap = IcebergWriter.rewritePositionDeleteFiles(spark, table)
    assert(snap.nonEmpty)
    // consolidated to one delete file; dangling d1 tombstones dropped
    val after = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "delete").count()
    assert(after === 1, s"expected 1 consolidated delete file, got $after")
    val rows = IcebergScan.positionDeletes(spark, table).count()
    assert(rows === 12, s"expected 12 surviving tombstones, got $rows") // 18 - 6 dangling
    // semantics unchanged: d0/d2 still tombstoned, d1 fully replaced
    val got = IcebergScan.scan(spark, table)
    assert(got.filter(col("dt") =!= "d1").collect().map(_.toSeq).toSet ===
      expect.filter(r => r(1) != "d1"))
    assert(got.filter(col("dt") === "d1").count() === 20)

    // SQL procedure surface (nothing left to rewrite the second time —
    // consolidated file is already minimal, but the proc still reports)
    graft.sql.GraftSql.register(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM iceberg_rewrite_position_deletes('$table')").head()
    assert(viaSql.getBoolean(0))
  }

  test("rewriteEqualityDeletes converts epoch eq-deletes to position tombstones") {
    import spark.implicits._
    val table = tmp("graft_req_") + "/t"
    val base = (1 to 40).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    IcebergWriter.write(base, table)                                // seq 1
    // three "epochs" with overlapping keys — the per-key sequence
    // windows CONFLICT (some keys re-inserted after others' deletes),
    // the exact shape that makes a single merged eq-delete file
    // semantically impossible and conversion the only bounded form
    IcebergWriter.merge(spark, table,                               // seq 2
      base.filter($"id" % 4 === 0).withColumn("payload", lit("u1")),
      keyCols = Seq("id"))
    IcebergWriter.deleteEquality(spark, table,                      // seq 3
      base.filter($"id" % 10 === 0).select("id"))
    IcebergWriter.merge(spark, table,                               // seq 4
      base.filter($"id" % 6 === 0).withColumn("payload", lit("u2")),
      keyCols = Seq("id"))

    val expect = IcebergScan.scan(spark, table).collect().map(_.toSeq).toSet
    val preSnap = IcebergScan.snapshots(spark, table)
      .agg(max("snapshot_id")).head().getLong(0)

    val snap = IcebergWriter.rewriteEqualityDeletes(spark, table)
    assert(snap.nonEmpty)
    // scan semantics pinned unchanged: stale versions stay dead,
    // re-inserted keys stay alive (30 was deleted at seq 3, re-inserted
    // at seq 4 — a conversion at the wrong sequence would kill it)
    val got = IcebergScan.scan(spark, table).collect().map(_.toSeq).toSet
    assert(got === expect)
    assert(got.exists(r => r.head == 30L && r(1) == "u2"))
    // the eq deletes became position tombstones (v2 form: parquet)
    assert(IcebergScan.positionDeletes(spark, table).count() > 0)
    // nothing equality-shaped left: a second call has no work
    assert(IcebergWriter.rewriteEqualityDeletes(spark, table).isEmpty)
    // the replace commit is invisible to the changelog
    assert(IcebergScan.changelog(spark, table, preSnap, None).count() === 0)
    // time travel to the pre-rewrite snapshot still applies the ORIGINAL
    // equality deletes under its own manifest tree
    assert(IcebergScan.scan(spark, table,
        IcebergScan.Options(snapshotId = Some(preSnap)))
      .collect().map(_.toSeq).toSet === expect)
  }

  test("rewriteEqualityDeletes on a v3 table emits deletion vectors") {
    import spark.implicits._
    val table = tmp("graft_req3_") + "/t"
    val base = (1 to 30).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    IcebergWriter.write(base, table, formatVersion = 3)
    IcebergWriter.merge(spark, table,
      base.filter($"id" % 3 === 0).withColumn("payload", lit("u1")),
      keyCols = Seq("id"))
    IcebergWriter.deleteEquality(spark, table,
      base.filter($"id" % 5 === 0).select("id"))
    val expect = IcebergScan.scan(spark, table).collect().map(_.toSeq).toSet

    assert(IcebergWriter.rewriteEqualityDeletes(spark, table).nonEmpty)
    assert(IcebergScan.scan(spark, table)
      .collect().map(_.toSeq).toSet === expect)
    assert(IcebergWriter.rewriteEqualityDeletes(spark, table).isEmpty)
    // v3 conversion lands as DVs (puffin), not parquet delete files
    val delFiles = IcebergScan.scan(spark, table,
        IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "delete")
      .collect().map(_.getString(0))
    assert(delFiles.nonEmpty)
    assert(delFiles.forall(_.endsWith(".puffin")),
      s"expected puffin DVs, got: ${delFiles.mkString(", ")}")
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

  test("zorder clusters files into key-space boxes that prune on EVERY dimension") {
    import spark.implicits._
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    // table A: plain sort by x — y-filters cannot prune (every file
    // spans the full y range)
    val sorted = tmp("graft_zorder_sorted_") + "/t"
    IcebergWriter.write(grid.repartition(1), sorted, sortBy = Seq("x"),
      options = Map("maxRecordsPerFile" -> "1024"))
    // table B: z-ordered on (x, y) — 4 files ≈ 4 quadrants
    val zordered = tmp("graft_zorder_z_") + "/t"
    IcebergWriter.write(grid.repartition(4), zordered)
    IcebergWriter.zorder(spark, zordered, Seq("x", "y"), numFiles = 4)

    def dataFiles(table: String, cond: Option[org.apache.spark.sql.Column]) = {
      val opts = IcebergScan.Options(mode = "list_files")
      val df = cond match {
        case Some(c) => IcebergScan.scanFiltered(spark, table, c, opts)
        case None => IcebergScan.scan(spark, table, opts)
      }
      df.filter(col("type") === "data").count()
    }
    assert(dataFiles(sorted, None) === 4)
    assert(dataFiles(zordered, None) === 4)
    val yBox = col("y") < 32
    assert(dataFiles(sorted, Some(yBox)) === 4)   // sort can't prune y
    // z-order CAN prune on y (4 = no pruning at all). Range boundaries
    // come from reservoir sampling, so the box may graze neighbor files
    // run-to-run — pin "strictly prunes", not an exact file count.
    assert(dataFiles(zordered, Some(yBox)) <= 3)
    val box = col("x") < 32 && col("y") < 32
    assert(dataFiles(zordered, Some(box)) <= 3)
    // semantics intact: same rows, box counts match the raw grid
    assert(IcebergScan.scan(spark, zordered).count() === 4096)
    assert(IcebergScan.scanFiltered(spark, zordered, box).count() === 1024)
  }

  test("zorder applies pending deletes and keeps tombstoned rows gone") {
    import spark.implicits._
    val table = tmp("graft_zorder_mor_") + "/t"
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y))
      .toDF("x", "y")
    IcebergWriter.write(grid.repartition(2), table)
    IcebergWriter.delete(spark, table, col("x") === 3 && col("y") === 3)
    IcebergWriter.zorder(spark, table, Seq("x", "y"), numFiles = 2)
    assert(IcebergScan.scan(spark, table).count() === 255)
    assert(IcebergScan.scanFiltered(spark, table,
      col("x") === 3 && col("y") === 3).count() === 0)
    // the rewrite holds no delete files — tombstones were applied
    assert(IcebergScan.files(spark, table)
      .filter(col("content") =!= 0).count() === 0)
  }

  test("all_manifests and all_files span every snapshot with shared manifests read once") {
    val table = tmp("graft_allmeta_") + "/t"
    (1L to 3L).foreach(i => IcebergWriter.write(idsDF(i), table))
    val am = IcebergScan.allManifests(spark, table).collect()
    // snapshot N's list carries N manifests → 1 + 2 + 3 rows
    assert(am.length === 6)
    assert(am.map(_.getLong(0)).distinct.length === 3)
    val af = IcebergScan.allFiles(spark, table).collect()
    // snapshot N holds N live files → 1 + 2 + 3 rows
    assert(af.length === 6)
    // the per-snapshot view matches files() for the head snapshot
    val headId = IcebergScan.snapshots(spark, table)
      .agg(max("snapshot_id")).head().getLong(0)
    val headFiles = af.filter(_.getLong(0) == headId).map(_.getString(2)).toSet
    val files = IcebergScan.files(spark, table).collect()
      .map(_.getString(1)).toSet
    assert(headFiles === files)
  }

  test("string bounds truncate to 16 code points in manifests and stay sound") {
    import spark.implicits._
    val table = tmp("graft_trunc_") + "/t"
    val aLong = "a" * 20 + "-first"
    val aMax = "a" * 20 + "-last!"
    val zLong = "z" * 20 + "-other"
    IcebergWriter.write(Seq(aLong, aMax).toDF("s").repartition(1), table)
    IcebergWriter.write(Seq(zLong).toDF("s").repartition(1), table)

    val bounds = IcebergScan.files(spark, table).collect().flatMap { r =>
      val lo = r.getAs[Map[Int, String]]("lower_bounds").values
      val hi = r.getAs[Map[Int, String]]("upper_bounds").values
      lo ++ hi
    }
    assert(bounds.nonEmpty)
    assert(bounds.forall(_.length <= 17),
      s"bound longer than truncate(16)+carry: ${bounds.maxBy(_.length)}")
    // soundness: exact-match scans still find their rows (no wrong prune)
    Seq(aLong, aMax, zLong).foreach { v =>
      assert(IcebergScan.scanFiltered(spark, table, col("s") === v).count() === 1)
    }
    // bounds still discriminate across files: a z-scan plans 1 of 2 files
    val kept = IcebergScan.scanFiltered(spark, table, col("s") === zLong,
      IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    assert(kept === 1)
    // prefix predicates prune as a [prefix, prefix+1) range over the
    // truncated bounds — and still return exact rows
    val keptPrefix = IcebergScan.scanFiltered(spark, table,
      col("s").startsWith("z"), IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    assert(keptPrefix === 1)
    assert(IcebergScan.scanFiltered(spark, table,
      col("s").startsWith("a" * 18)).count() === 2)
  }

  test("hash distribution clusters a partitioned append into few files per partition") {
    import spark.implicits._
    val src = (1L to 2000L).map(i => (i, java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, (i % 10 + 1).toInt)))).toDF("id", "dt")
      .repartition(16) // rows of every day in every task
    val none = tmp("graft_dist_none_") + "/t"
    IcebergWriter.write(src, none, partitionBy = Seq("dt" -> "day"))
    val hash = tmp("graft_dist_hash_") + "/t"
    IcebergWriter.write(src, hash, partitionBy = Seq("dt" -> "day"),
      distribution = "hash")
    def fileCount(t: String) = IcebergScan.files(spark, t).count()
    // none: up to tasks × partitions files; hash: ~one file per partition
    assert(fileCount(none) > 3 * fileCount(hash),
      s"none=${fileCount(none)} hash=${fileCount(hash)}")
    assert(fileCount(hash) <= 20)
    // same rows either way
    assert(IcebergScan.scan(spark, hash).count() === 2000)
    assert(IcebergScan.scan(spark, hash).agg(sum("id")).head().getLong(0) ===
      (1L to 2000L).sum)
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

  test("sort orders persist across sort-less commits (spec: append-only metadata)") {
    import spark.implicits._
    import graft.iceberg.{IcebergIO, IcebergPruning}
    val table = tmp("graft_sortkeep_") + "/t"
    val df = (1L to 1000L).map(i => (i, s"p-$i")).toDF("id", "payload")
    IcebergWriter.write(df, table, sortBy = Seq("id"))
    def meta() = {
      val conf = spark.sessionState.newHadoopConf()
      val hint = IcebergIO.readString(s"$table/metadata/version-hint.text", conf).trim
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        IcebergIO.readString(s"$table/metadata/v$hint.metadata.json", conf))
    }
    assert(meta().get("default-sort-order-id").asInt === 1)
    // a sort-less append, a delete and a compaction must all KEEP it
    IcebergWriter.write((1001L to 1010L).map(i => (i, s"p-$i")).toDF("id", "payload"), table)
    assert(meta().get("default-sort-order-id").asInt === 1)
    IcebergWriter.delete(spark, table, col("id") === 5L)
    IcebergWriter.compact(spark, table)
    assert(meta().get("default-sort-order-id").asInt === 1)
    // re-declaring the same sort adds NO duplicate order
    IcebergWriter.write((1011L to 1012L).map(i => (i, s"p-$i")).toDF("id", "payload"),
      table, sortBy = Seq("id"))
    assert(meta().get("sort-orders").size === 2) // order 0 + order 1
    assert(meta().get("default-sort-order-id").asInt === 1)
    // a DIFFERENT sort appends order 2 and redirects the default
    IcebergWriter.write((1013L to 1014L).map(i => (i, s"p-$i")).toDF("id", "payload"),
      table, sortBy = Seq("payload"))
    assert(meta().get("sort-orders").size === 3)
    assert(meta().get("default-sort-order-id").asInt === 2)
  }

  test("rewriteDataFiles strategy=sort reclusters by the recorded sort order") {
    import spark.implicits._
    import graft.iceberg.IcebergPruning
    import graft.iceberg.IcebergScan.Options
    val table = tmp("graft_sortrw_") + "/t"
    // sorted creation, then unsorted scrambled appends degrade the layout
    val a = (1L to 8000L).map(i => (i, s"p-$i")).toDF("id", "payload")
    IcebergWriter.write(a, table, sortBy = Seq("id"), distribution = "range",
      distributionPartitions = Some(4))
    val b = (8001L to 16000L).map(i => (i, s"p-$i")).toDF("id", "payload")
      .orderBy(rand(7)).repartition(4)
    IcebergWriter.write(b, table) // unsorted: wide overlapping bounds
    IcebergWriter.delete(spark, table, col("id") % 1000L === 0L)
    def keptFor(probe: Long): Long =
      IcebergScan.scan(spark, table, Options(mode = "list_files",
          filters = Seq(IcebergPruning.ColPredicate(
            "id", IcebergPruning.Eq, probe))))
        .filter(col("type") === "data").count()
    assert(keptFor(12345L) > 1, "unsorted append should overlap bounds")
    val snap = IcebergWriter.rewriteDataFiles(spark, table,
      targetFileSize = 256L * 1024, strategy = "sort")
    assert(snap.isDefined, "sort rewrite did not commit")
    // reclustered: every probe key now lives in exactly one file, the
    // MoR delete stayed applied, and rows are intact
    for (probe <- Seq(1L, 7777L, 12345L, 15999L))
      assert(keptFor(probe) === 1, s"key $probe not uniquely clustered")
    assert(IcebergScan.scan(spark, table).count() === 16000 - 16)
    assert(IcebergScan.scan(spark, table)
      .filter(col("id") % 1000L === 0L).count() === 0)
    // the rewrite is a replace: changelog from before it is empty
    val snaps = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect().map(_.getAs[Long]("snapshot_id"))
    assert(IcebergScan.changelog(spark, table,
      snaps(snaps.length - 2), Some(snaps.last)).count() === 0)
  }

  test("branch-aware retention: WAP branch survives a main-line expire " +
      "per the per-ref property matrix") {
    // The write-audit-publish shape: snapshots staged on a branch must
    // outlive an aggressive main-line retention sweep — per-ref policies
    // (min-snapshots-to-keep / max-snapshot-age-ms) protect the branch's
    // PRE-FORK ancestors too, and a lapsed ref (max-ref-age-ms) releases
    // everything it pinned.
    val table = tmp("graft_wap_ret_") + "/t"
    IcebergWriter.write(idsDF(1L), table)                   // s1 (main)
    IcebergWriter.write(idsDF(2L), table)                   // s2 (main)
    IcebergWriter.write(idsDF(3L), table)                   // s3 (main)
    val s3 = IcebergScan.snapshots(spark, table)
      .orderBy(desc("sequence_number")).limit(1)
      .collect()(0).getAs[Long]("snapshot_id")
    IcebergWriter.createBranch(spark, table, "wap")         // head = s3
    IcebergWriter.write(idsDF(4L), table, branch = "wap")   // s4 (staged)
    IcebergWriter.write(idsDF(5L), table, branch = "wap")   // s5 (staged)
    IcebergWriter.write(idsDF(6L), table)                   // s6 (main)
    // wap's newest 3 ancestors = s5, s4 and the PRE-FORK s3 — the policy
    // must reach across the fork point, not stop at staged commits
    IcebergWriter.setRefRetention(spark, table, "wap",
      minSnapshotsToKeep = Some(3))
    val now = System.currentTimeMillis() + 10000
    val dropped = IcebergWriter.expireSnapshotsOlderThan(
      spark, table, olderThanMs = now, nowMs = now)
    // expire-everything sweep: only main's pre-fork history (s1, s2) may
    // go — s6 is the protected main head, s5/s4 staged WAP lineage,
    // s3 kept by the branch's min-snapshots-to-keep
    assert(dropped === 2)
    val ids = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect().map(_.getAs[Long]("snapshot_id"))
    assert(ids.length === 4)
    // the branch still reads its full staged state (5 rows: s1..s5 appends
    // minus the expired... appends accumulate, so wap sees 1..5)
    val wapRows = IcebergScan.scan(spark, table,
      IcebergScan.Options(snapshotFromRef = Some("wap")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(wapRows === Set(1L, 2L, 3L, 4L, 5L))
    // main unaffected by the branch: 1,2,3,6
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 6L))
    // the fork-point ancestor s3 time-travel-resolves (policy kept it —
    // without min-snapshots-to-keep=3 the sweep would have expired it)
    assert(ids.contains(s3))
    // Now the ref lapses: max-ref-age 0 drops the branch AND its staged
    // snapshots in the same sweep — the pinned history frees
    IcebergWriter.setRefRetention(spark, table, "wap",
      maxRefAgeMs = Some(0L))
    val now2 = System.currentTimeMillis() + 10000
    val dropped2 = IcebergWriter.expireSnapshotsOlderThan(
      spark, table, olderThanMs = now2, nowMs = now2)
    val info = IcebergScan.loadInfo(spark, table)
    assert(!info.refs.contains("wap"))
    assert(dropped2 === 3) // s3, s4, s5 — nothing pins them anymore
    assert(IcebergScan.snapshots(spark, table).count() === 1) // s6 only
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 6L))
  }
}
