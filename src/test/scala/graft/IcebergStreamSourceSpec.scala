package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** The Iceberg STREAMING SOURCE (`format("graft-iceberg")`): append
  * snapshots become micro-batches, offsets survive checkpoints, and the
  * operation policy (skip vs fail on deletes/overwrites/compaction)
  * keeps append-only semantics honest. */
class IcebergStreamSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-stream-source").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idsDF(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id").withColumn("payload", concat(lit("row-"), col("id")))
  }

  private def readSource(table: String, extra: (String, String)*) = {
    val r = spark.readStream.format("graft-iceberg").option("path", table)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  private def startToMemory(df: DataFrame, name: String,
                            checkpoint: Option[String] = None): StreamingQuery = {
    val w = df.writeStream.format("memory").queryName(name).outputMode("append")
    checkpoint.fold(w)(w.option("checkpointLocation", _)).start()
  }

  private def memoryIds(name: String): Set[Long] =
    spark.table(name).select("id").collect().map(_.getLong(0)).toSet

  test("append snapshots stream as micro-batches, later appends continue the stream") {
    val table = tmp("graft_src_basic_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)
    IcebergWriter.write(idsDF(3), table)
    val q = startToMemory(readSource(table), "src_basic")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_basic") === Set(1L, 2L, 3L))
      IcebergWriter.write(idsDF(4, 5), table)
      q.processAllAvailable()
      assert(memoryIds("src_basic") === Set(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("option('table', catalog identifier) streams a catalog-managed table (round 11)") {
    val wh = tmp("graft_src_cat_wh_")
    spark.conf.set("spark.sql.catalog.gsrc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsrc.warehouse", wh)
    val table = s"$wh/db/stream_t"
    IcebergWriter.write(idsDF(1, 2), table)
    val df = spark.readStream.format("graft-iceberg")
      .option("table", "gsrc.db.stream_t").load()
    val q = startToMemory(df, "src_cat")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_cat") === Set(1L, 2L))
      IcebergWriter.write(idsDF(3), table)
      q.processAllAvailable()
      assert(memoryIds("src_cat") === Set(1L, 2L, 3L))
    } finally q.stop()
    // both path and table → loud error
    val e = intercept[Exception] {
      spark.readStream.format("graft-iceberg")
        .option("table", "gsrc.db.stream_t").option("path", table).load()
    }
    assert(e.getMessage.contains("exactly one"), e.getMessage)
  }

  test("filters and projections push into each micro-batch's parquet scan") {
    val table = tmp("graft_src_push_") + "/t"
    IcebergWriter.write(idsDF(1L to 10L: _*), table)
    val q = startToMemory(
      readSource(table).where(col("id") > 7).select("id"), "src_push")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_push") === Set(8L, 9L, 10L))
    } finally q.stop()
  }

  test("max-snapshots-per-trigger paces the backfill one snapshot per batch") {
    val table = tmp("graft_src_paced_") + "/t"
    (1L to 3L).foreach(i => IcebergWriter.write(idsDF(i), table))
    val q = startToMemory(
      readSource(table, "max-snapshots-per-trigger" -> "1"), "src_paced")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_paced") === Set(1L, 2L, 3L))
      // 3 snapshots at 1 per trigger = at least batches 0,1,2
      assert(q.lastProgress.batchId >= 2,
        s"expected >=3 batches, saw batchId ${q.lastProgress.batchId}")
    } finally q.stop()
  }

  test("max-files-per-trigger slices one giant snapshot into paced batches") {
    val table = tmp("graft_src_files_") + "/t"
    // ONE snapshot holding 6 files
    IcebergWriter.write(idsDF(1L to 6L: _*).repartition(6), table)
    val q = startToMemory(
      readSource(table, "max-files-per-trigger" -> "2"), "src_files")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_files") === (1L to 6L).toSet)
      // 6 files at 2 per trigger = at least batches 0,1,2
      assert(q.lastProgress.batchId >= 2,
        s"expected >=3 batches, saw batchId ${q.lastProgress.batchId}")
      // appends continue past the sliced snapshot
      IcebergWriter.write(idsDF(7), table)
      q.processAllAvailable()
      assert(memoryIds("src_files") === (1L to 7L).toSet)
    } finally q.stop()
  }

  test("file-paced checkpoint restart resumes mid-snapshot exactly once") {
    val table = tmp("graft_src_fckpt_") + "/t"
    val checkpoint = tmp("graft_src_fckpt_cp_")
    IcebergWriter.write(idsDF(1L to 4L: _*).repartition(4), table)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): StreamingQuery =
      readSource(table, "max-files-per-trigger" -> "1").writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => got.add(r.getLong(0)))
        }.start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    val q2 = run()
    try {
      q2.processAllAvailable()
      val all = got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
      assert(all.sorted === Seq(1L, 2L, 3L, 4L), s"saw $all")
    } finally q2.stop()
  }

  test("checkpoint restart resumes after the committed offset, never re-streaming") {
    val table = tmp("graft_src_ckpt_") + "/t"
    val checkpoint = tmp("graft_src_ckpt_cp_")
    IcebergWriter.write(idsDF(1, 2), table)
    def run(into: java.util.Queue[Long]): StreamingQuery =
      readSource(table).writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => into.add(r.getLong(0)))
        }.start()
    val first = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q1 = run(first)
    try {
      q1.processAllAvailable()
      assert(first.toArray(Array.empty[java.lang.Long]).toSet === Set(1L, 2L))
    } finally q1.stop()
    IcebergWriter.write(idsDF(3), table)
    // Fresh collector: anything older than the checkpointed offset
    // would re-appear here — only snapshot 2's rows may arrive.
    val second = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = run(second)
    try {
      q2.processAllAvailable()
      assert(second.toArray(Array.empty[java.lang.Long]).toSet === Set(3L))
    } finally q2.stop()
  }

  test("stream-from-latest skips existing history") {
    val table = tmp("graft_src_latest_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)
    val q = startToMemory(
      readSource(table, "stream-from-latest" -> "true"), "src_latest")
    try {
      q.processAllAvailable()
      assert(memoryIds("src_latest") === Set.empty[Long])
      IcebergWriter.write(idsDF(9), table)
      q.processAllAvailable()
      assert(memoryIds("src_latest") === Set(9L))
    } finally q.stop()
  }

  test("a delete snapshot fails the stream unless skip-delete-snapshots is set") {
    val table = tmp("graft_src_del_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)
    IcebergWriter.delete(spark, table, col("id") === 1)
    IcebergWriter.write(idsDF(3), table)
    val q = startToMemory(readSource(table), "src_del_fail")
    try {
      val e = intercept[Exception](q.processAllAvailable())
      assert(e.getMessage.contains("delete") ||
        Option(q.exception.orNull).exists(_.getMessage.contains("delete")))
    } finally q.stop()
    // skip option: the stream keeps append-only semantics — the deleted
    // row STAYS (it was appended; CDC consumers use iceberg_changelog)
    val q2 = startToMemory(
      readSource(table, "skip-delete-snapshots" -> "true"), "src_del_skip")
    try {
      q2.processAllAvailable()
      assert(memoryIds("src_del_skip") === Set(1L, 2L, 3L))
    } finally q2.stop()
  }

  test("compaction (replace) snapshots are skipped — no duplicate rows") {
    val table = tmp("graft_src_compact_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)
    IcebergWriter.write(idsDF(3), table)
    IcebergWriter.compact(spark, table)
    IcebergWriter.write(idsDF(4), table)
    val q = startToMemory(readSource(table), "src_compact")
    try {
      q.processAllAvailable()
      val all = spark.table("src_compact").select("id").collect().map(_.getLong(0)).toSeq
      assert(all.sorted === Seq(1L, 2L, 3L, 4L), s"saw $all")
    } finally q.stop()
  }

  test("source composes with windowed streaming aggregations (hourlyAgg)") {
    import spark.implicits._
    val table = tmp("graft_src_agg_") + "/t"
    def ev(id: Long, t: String, typ: String, v: Double) =
      graft.streaming.Event(id, java.sql.Timestamp.valueOf(t), 1L, typ, v)
    IcebergWriter.write(Seq(
      ev(1, "2026-01-01 10:05:00", "click", 1.0),
      ev(2, "2026-01-01 10:55:00", "click", 2.0)).toDF(), table)
    IcebergWriter.write(Seq(
      ev(3, "2026-01-01 11:10:00", "view", 4.0)).toDF(), table)
    val q = graft.streaming.EventStreams.hourlyAgg(readSource(table))
      .writeStream.format("memory").queryName("src_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("src_hourly").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }

  test("branch option streams a staging branch's commits before publish") {
    val table = tmp("graft_src_branch_") + "/t"
    IcebergWriter.write(idsDF(1), table)
    graft.iceberg.IcebergWriter.createBranch(spark, table, "audit")
    IcebergWriter.write(idsDF(2), table, branch = "audit")
    val qMain = startToMemory(readSource(table), "src_br_main")
    val qAudit = startToMemory(
      readSource(table, "branch" -> "audit"), "src_br_audit")
    try {
      qMain.processAllAvailable()
      qAudit.processAllAvailable()
      assert(memoryIds("src_br_main") === Set(1L))     // staged row invisible
      assert(memoryIds("src_br_audit") === Set(1L, 2L)) // branch lineage
    } finally { qMain.stop(); qAudit.stop() }
  }

  test("table-to-table mirror: source feeds the Iceberg sink exactly once") {
    val src = tmp("graft_src_mirror_a_") + "/t"
    val dst = tmp("graft_src_mirror_b_") + "/t"
    val checkpoint = tmp("graft_src_mirror_cp_")
    IcebergWriter.write(idsDF(1, 2), src)
    val q = graft.streaming.IcebergStreamSink.start(
      readSource(src), dst, checkpoint, sinkId = "mirror")
    try {
      q.processAllAvailable()
      IcebergWriter.write(idsDF(3), src)
      q.processAllAvailable()
      val out = IcebergScan.scan(spark, dst)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(out.sorted === Seq(1L, 2L, 3L))
      // one append snapshot per non-empty micro-batch, each tagged
      assert(IcebergScan.snapshots(spark, dst).count() >= 2)
    } finally q.stop()
  }

  test("mode=cdc streams deletes and overwrites as row-level changes") {
    import spark.implicits._
    val table = tmp("graft_src_cdc_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3), table)               // inserts
    IcebergWriter.delete(spark, table, col("id") === 1)      // delete commit
    IcebergWriter.write(idsDF(4), table)                     // more inserts
    // overwrite commit: row 2's payload changes via merge-by-key
    IcebergWriter.merge(spark, table,
      Seq((2L, "row-2-v2")).toDF("id", "payload"), Seq("id"))
    val q = startToMemory(
      readSource(table, "mode" -> "cdc"), "src_cdc_changes")
    try {
      q.processAllAvailable()
      val got = spark.table("src_cdc_changes")
        .select("id", "payload", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set(
        (1L, "row-1", "insert"), (2L, "row-2", "insert"),
        (3L, "row-3", "insert"), (4L, "row-4", "insert"),
        (1L, "row-1", "delete"),                 // the delete commit
        (2L, "row-2", "delete"), (2L, "row-2-v2", "insert")), // the merge
        s"saw $got")
      // commit attribution rides along
      assert(spark.table("src_cdc_changes")
        .select("_commit_snapshot_id").distinct().count() === 4)
    } finally q.stop()
  }

  test("mode=cdc resumes from the checkpoint and streams only new diffs") {
    val table = tmp("graft_src_cdcr_") + "/t"
    val ckpt = tmp("graft_src_cdcr_ckpt_")
    IcebergWriter.write(idsDF(1, 2), table)
    def run(into: java.util.Queue[(Long, String)]): StreamingQuery =
      readSource(table, "mode" -> "cdc").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id", "_change_type").collect()
            .foreach(r => into.add((r.getLong(0), r.getString(1))))
        }.start()
    val first = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q1 = run(first)
    try {
      q1.processAllAvailable()
      assert(first.toArray(Array.empty[(Long, String)]).toSet ===
        Set((1L, "insert"), (2L, "insert")))
    } finally q1.stop()
    // a delete lands while the stream is down; restart picks up JUST it
    IcebergWriter.delete(spark, table, col("id") === 2)
    val second = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q2 = run(second)
    try {
      q2.processAllAvailable()
      val rows = second.toArray(Array.empty[(Long, String)]).toSeq
      assert(rows === Seq((2L, "delete")), s"saw $rows")
    } finally q2.stop()
  }

  test("mode=cdc with update-keys pairs updates, across a checkpoint restart") {
    val table = tmp("graft_src_cdcu_") + "/t"
    val ckpt = tmp("graft_src_cdcu_ckpt_")
    IcebergWriter.write(idsDF(1, 2, 3), table)
    def run(into: java.util.Queue[(Long, String, String)]): StreamingQuery =
      readSource(table, "mode" -> "cdc", "update-keys" -> "id").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id", "payload", "_change_type").collect()
            .foreach(r => into.add((r.getLong(0), r.getString(1), r.getString(2))))
        }.start()
    // an UPDATE commit (same-commit delete+insert per row) pairs into
    // preimage/postimage instead of raw delete+insert
    IcebergWriter.update(spark, table, col("id") === 2,
      Map("payload" -> lit("row-2-v2")))
    val first = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val q1 = run(first)
    try {
      q1.processAllAvailable()
      val rows = first.toArray(Array.empty[(Long, String, String)]).toSet
      assert(rows === Set(
        (1L, "row-1", "insert"), (2L, "row-2", "insert"), (3L, "row-3", "insert"),
        (2L, "row-2", "update_preimage"), (2L, "row-2-v2", "update_postimage")),
        s"saw $rows")
    } finally q1.stop()
    // another update lands while the stream is down; the restarted query
    // re-pairs JUST the new commit from the checkpoint
    IcebergWriter.update(spark, table, col("id") === 3,
      Map("payload" -> lit("row-3-v2")))
    val second = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val q2 = run(second)
    try {
      q2.processAllAvailable()
      val rows = second.toArray(Array.empty[(Long, String, String)]).toSet
      assert(rows === Set(
        (3L, "row-3", "update_preimage"), (3L, "row-3-v2", "update_postimage")),
        s"saw $rows")
    } finally q2.stop()
    // update-keys without cdc mode is rejected up front
    val err = intercept[Exception] {
      startToMemory(readSource(table, "update-keys" -> "id"), "src_cdcu_bad")
        .processAllAvailable()
    }
    assert(err.getMessage.contains("update-keys requires mode=cdc") ||
      Option(err.getCause).exists(_.getMessage.contains("update-keys requires mode=cdc")),
      err.getMessage)
  }

  test("mode=cdc paces per snapshot: each batch diffs a bounded window") {
    val table = tmp("graft_src_cdcp_") + "/t"
    IcebergWriter.write(idsDF(1), table)
    IcebergWriter.write(idsDF(2), table)
    IcebergWriter.delete(spark, table, col("id") === 1)
    IcebergWriter.write(idsDF(3), table)
    IcebergWriter.write(idsDF(4), table)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = readSource(table, "mode" -> "cdc",
        "max-snapshots-per-trigger" -> "2").writeStream
      .foreachBatch { (b: DataFrame, _: Long) => batches.add(b.count()): Unit }
      .start()
    try {
      q.processAllAvailable()
      val sizes = batches.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      // 5 snapshots / 2 per trigger -> at least 3 non-trivial batches,
      // all changes delivered exactly once
      assert(sizes.count(_ > 0) >= 3, sizes.toSeq.toString)
      assert(sizes.sum === 5, sizes.toSeq.toString) // 4 inserts + 1 delete
    } finally q.stop()
  }

  test("mode=cdc with stream-from-latest diffs only post-start commits") {
    val table = tmp("graft_src_cdcl_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3), table) // pre-start history
    val q = startToMemory(
      readSource(table, "mode" -> "cdc", "stream-from-latest" -> "true"),
      "src_cdc_latest")
    try {
      q.processAllAvailable()
      assert(spark.table("src_cdc_latest").count() === 0)
      IcebergWriter.delete(spark, table, col("id") === 3)
      q.processAllAvailable()
      val rows = spark.table("src_cdc_latest")
        .select("id", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((3L, "delete")), s"saw $rows")
    } finally q.stop()
  }
}
