package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, EventStreams}

/** Structured Streaming operators driven through MemoryStream: the
  * streaming results must agree with the equivalent batch computation on
  * the same rows (the e01/e02 semantics). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-streaming").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourly tumbling aggregation over a stream matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyAgg(in.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:55:00"), 2, "click", 2.0),
        Event(3, ts("2026-01-01 11:10:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set(
        ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 11:00:00.0", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("declarative session windows merge events within the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeDeclarative(in.toDF())
      .writeStream.format("memory").queryName("sessions_decl").outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 1, "click", 2.0), // same session
        Event(3, ts("2026-01-01 12:00:00"), 1, "click", 4.0), // new session
        Event(4, ts("2026-01-01 10:03:00"), 2, "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_decl").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      assert(rows === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("stream-stream attribution join matches purchases to prior clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.attributePurchases(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 0.0),
        Event(2, ts("2026-01-01 10:05:00"), 2, "click", 0.0))
      purchases.addData(
        Event(10, ts("2026-01-01 10:30:00"), 1, "purchase", 5.0), // within 1h of click 1
        Event(11, ts("2026-01-01 12:00:00"), 1, "purchase", 9.0)) // outside the window
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
      assert(rows === Set((1L, 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2026-01-01 10:00:30"), 1, "click", 1.0), // duplicate id
        Event(2, ts("2026-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(1, ts("2026-01-01 10:02:00"), 1, "click", 1.0)) // still dup
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("custom-state sessionizer emits sessions when the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionizeCustomState(in.toDS())
      .writeStream.format("memory").queryName("sessions_fmgws").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 1, "click", 2.0),
        Event(3, ts("2026-01-01 10:03:00"), 2, "view", 8.0))
      q.processAllAvailable()
      // advance event time far past the sessions' close...
      in.addData(Event(4, ts("2026-01-01 14:00:00"), 3, "click", 0.5))
      q.processAllAvailable()
      // ...and one more batch so the new watermark drives timeout processing
      in.addData(Event(5, ts("2026-01-01 14:01:00"), 3, "click", 0.5))
      q.processAllAvailable()
      val rows = spark.table("sessions_fmgws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val base = ts("2026-01-01 10:00:00").getTime * 1000L
      assert(rows.contains((1L, 2L, base, base + 600L * 1000000L, 3.0)), rows)
      assert(rows.contains((2L, 1L, base + 180L * 1000000L, base + 180L * 1000000L, 8.0)), rows)
    } finally q.stop()
  }

  test("continuous ingestion keeps planning I/O bounded via manifest merge") {
    import spark.implicits._
    import graft.iceberg.IcebergScan
    import graft.streaming.IcebergStreamSink
    val table = java.nio.file.Files.createTempDirectory("graft_sinkm_").toString + "/t"
    (0 until 25).foreach { b =>
      val batch = Seq(
        Event(b.toLong, ts("2026-01-01 10:00:00"), b.toLong, "click", 1.0)).toDF()
      IcebergStreamSink.commitBatch(batch, batchId = b, table, Seq.empty)
    }
    // full history retained…
    assert(IcebergScan.scan(spark, table).count() === 25)
    assert(IcebergScan.snapshots(spark, table).count() === 25)
    // …but the CURRENT snapshot's manifest list stays bounded (merge
    // maintenance), so scan planning I/O does not grow with commit count
    val manifests = IcebergScan.metadata(spark, table)
      .select("manifest_path").distinct().count()
    assert(manifests <= 11, s"planning reads $manifests manifests")
  }

  test("Iceberg sink commits one snapshot per batch and replays idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.iceberg.IcebergScan
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_")
    val table = dir.toString + "/t"
    val in = MemoryStream[Event]
    val q = IcebergStreamSink.start(in.toDF(), table, dir.toString + "/ckpt")
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 2, "view", 2.0))
      q.processAllAvailable()
      assert(IcebergScan.scan(spark, table).count() === 2)

      in.addData(Event(3, ts("2026-01-01 10:20:00"), 1, "purchase", 4.0))
      q.processAllAvailable()
      assert(IcebergScan.scan(spark, table).count() === 3)
      // one snapshot per non-empty batch → full ingestion history
      assert(IcebergScan.snapshots(spark, table).count() === 2)

      // a replayed batch (failure recovery) must not double-append
      val replay = Seq(
        Event(3, ts("2026-01-01 10:20:00"), 1, "purchase", 4.0)).toDF()
      IcebergStreamSink.commitBatch(replay, batchId = 1, table, Seq.empty)
      assert(IcebergScan.scan(spark, table).count() === 3)
      assert(IcebergScan.snapshots(spark, table).count() === 2)
      // a genuinely NEW batch id still commits
      IcebergStreamSink.commitBatch(replay, batchId = 2, table, Seq.empty)
      assert(IcebergScan.scan(spark, table).count() === 4)

      // bookkeeping survives maintenance: compaction writes no batch id
      // itself, but carries the max forward — so a replay AFTER compact
      // still must not double-commit
      graft.iceberg.IcebergWriter.compact(spark, table)
      IcebergStreamSink.commitBatch(replay, batchId = 2, table, Seq.empty)
      assert(IcebergScan.scan(spark, table).count() === 4)
      // a second sink with its own id is independent bookkeeping
      IcebergStreamSink.commitBatch(replay, batchId = 0, table, Seq.empty, sinkId = "other")
      assert(IcebergScan.scan(spark, table).count() === 5)
    } finally q.stop()
  }

  test("staged streaming ingestion: batches land on a branch until publish") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.iceberg.{IcebergScan, IcebergWriter}
    import graft.iceberg.IcebergScan.Options
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_sinkb_")
    val table = dir.toString + "/t"
    // seed main, then stage the stream on a branch
    IcebergWriter.write(Seq(
      Event(0, ts("2026-01-01 09:00:00"), 9, "seed", 0.0)).toDF(), table)
    IcebergWriter.createBranch(spark, table, "ingest")
    val in = MemoryStream[Event]
    val q = IcebergStreamSink.start(in.toDF(), table, dir.toString + "/ckpt",
      sinkId = "staged", branch = "ingest")
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 2, "view", 2.0))
      q.processAllAvailable()
      // main unchanged, branch has the batch
      assert(IcebergScan.scan(spark, table).count() === 1)
      assert(IcebergScan.scan(spark, table,
        Options(snapshotFromRef = Some("ingest"))).count() === 3)

      // replay dedup works across branches (summary scan covers all
      // retained snapshots)
      val replay = Seq(
        Event(2, ts("2026-01-01 10:10:00"), 2, "view", 2.0)).toDF()
      IcebergStreamSink.commitBatch(
        replay, batchId = 0, table, Seq.empty, sinkId = "staged", branch = "ingest")
      assert(IcebergScan.scan(spark, table,
        Options(snapshotFromRef = Some("ingest"))).count() === 3)

      IcebergWriter.fastForward(spark, table, "ingest")
      assert(IcebergScan.scan(spark, table).count() === 3)
    } finally q.stop()
  }

  test("Iceberg OVERWRITE sink: recomputed windows replace their partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.iceberg.IcebergScan
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_owsink_")
    val table = dir.toString + "/t"
    val in = MemoryStream[Event]
    // per-day event counts, recomputed as late events arrive
    val agg = in.toDF()
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
    val q = IcebergStreamSink.startOverwrite(agg, table, dir.toString + "/ckpt",
      partitionBy = Seq("dt" -> "identity"))
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 11:00:00"), 2, "view", 2.0),
        Event(3, ts("2026-01-02 09:00:00"), 3, "view", 4.0))
      q.processAllAvailable()
      val day1 = IcebergScan.scan(spark, table)
        .filter(col("dt") === lit("2026-01-01").cast("date"))
      assert(day1.head().getAs[Long]("cnt") === 2)

      // a late day-1 event: the recomputed day-1 row REPLACES the old
      // one; day 2 is untouched (its partition is not in the batch)
      in.addData(Event(4, ts("2026-01-01 23:00:00"), 4, "click", 8.0))
      q.processAllAvailable()
      val now = IcebergScan.scan(spark, table)
      assert(now.count() === 2) // one row per day, no duplicates
      assert(now.filter(col("dt") === lit("2026-01-01").cast("date"))
        .head().getAs[Long]("cnt") === 3)
      assert(now.filter(col("dt") === lit("2026-01-02").cast("date"))
        .head().getAs[Long]("cnt") === 1)
    } finally q.stop()
  }

  test("OVERWRITE sink refuses finer-than-partition groupings in update mode") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_owguard_")
    val in = MemoryStream[Event]
    // day + user grouping under a day partition: update mode emits only
    // the CHANGED (day,user) rows, so a recomputed day's unchanged users
    // would be dropped from the replaced partition — must refuse up front
    val fine = in.toDF()
      .groupBy(to_date(col("ts")).as("dt"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val e = intercept[IllegalArgumentException] {
      IcebergStreamSink.startOverwrite(fine, dir.toString + "/t",
        dir.toString + "/ckpt", partitionBy = Seq("dt" -> "identity"))
    }
    assert(e.getMessage.contains("WHOLE partitions"), e.getMessage)

    // complete mode re-emits every group per trigger — the same finer
    // grouping is safe and produces exact per-(day,user) counts
    import graft.iceberg.IcebergScan
    val q = IcebergStreamSink.startOverwrite(fine, dir.toString + "/t2",
      dir.toString + "/ckpt2", partitionBy = Seq("dt" -> "identity"),
      outputMode = "complete")
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 11:00:00"), 1, "view", 2.0),
        Event(3, ts("2026-01-01 12:00:00"), 2, "view", 3.0))
      q.processAllAvailable()
      in.addData(Event(4, ts("2026-01-01 13:00:00"), 2, "click", 4.0))
      q.processAllAvailable()
      val got = IcebergScan.scan(spark, dir.toString + "/t2")
        .orderBy("user_id").collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt")))
      assert(got.toSeq === Seq((1L, 2L), (2L, 2L)))
    } finally q.stop()
  }

  test("OVERWRITE sink accepts window() grouping with the partition from window.start") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.iceberg.IcebergScan
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_owwin_")
    val table = dir.toString + "/t"
    val in = MemoryStream[Event]
    // tumbling hourly window; the partition column is the window START —
    // start ↔ window is a bijection, so each batch group IS a whole
    // partition (the documented pattern the gate previously rejected)
    val agg = in.toDF()
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hour_start", col("window.start"))
      .drop("window")
    // hour transform over the window start — the Iceberg idiom for
    // time partitions (identity over raw timestamps is rejected)
    val q = IcebergStreamSink.startOverwrite(agg, table, dir.toString + "/ckpt",
      partitionBy = Seq("hour_start" -> "hour"))
    try {
      in.addData(
        Event(1, ts("2026-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:40:00"), 2, "view", 2.0),
        Event(3, ts("2026-01-01 11:10:00"), 3, "view", 4.0))
      q.processAllAvailable()
      // a late 10:00-hour event recomputes that window; 11:00 untouched
      in.addData(Event(4, ts("2026-01-01 10:55:00"), 4, "click", 8.0))
      q.processAllAvailable()
      val rows = IcebergScan.scan(spark, table)
        .orderBy("hour_start").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("hour_start")
          .toLocalDateTime.getHour, r.getAs[Long]("cnt")))
      assert(rows.toSeq === Seq((10, 3L), (11, 1L)))
    } finally q.stop()

    // still refused: a window group plus an EXTRA key under a
    // window-start partition (finer than the partition)
    val fine = in.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hour_start", col("window.start"))
      .drop("window")
    val e = intercept[IllegalArgumentException] {
      IcebergStreamSink.startOverwrite(fine, dir.toString + "/t2",
        dir.toString + "/ckpt2", partitionBy = Seq("hour_start" -> "hour"))
    }
    assert(e.getMessage.contains("WHOLE partitions"), e.getMessage)
  }

  test("OVERWRITE sink gate: unprojected grouping columns and fake windows refused") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_owguard2_")
    val in = MemoryStream[Event]
    // SQL can group by a column it does NOT project: the grouping is
    // still finer than the partition, and a batch holds only the changed
    // (day, user) groups — the day overwrite would drop the other users
    in.toDF().createOrReplaceTempView("ow_guard_events")
    val hidden = spark.sql(
      """SELECT to_date(ts) AS dt, COUNT(*) AS cnt
         FROM ow_guard_events GROUP BY to_date(ts), user_id""")
    val e1 = intercept[IllegalArgumentException] {
      IcebergStreamSink.startOverwrite(hidden, dir.toString + "/t1",
        dir.toString + "/ckpt1", partitionBy = Seq("dt" -> "identity"))
    }
    assert(e1.getMessage.contains("WHOLE partitions"), e1.getMessage)

    // a user struct named start/end is NOT a time window: many distinct
    // groups share one 'start' value, so .start does not cover the group
    val fake = in.toDF()
      .groupBy(struct(col("event_type").as("start"),
        col("event_type").as("end")).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p", col("w.start")).drop("w")
    val e2 = intercept[IllegalArgumentException] {
      IcebergStreamSink.startOverwrite(fake, dir.toString + "/t2",
        dir.toString + "/ckpt2", partitionBy = Seq("p" -> "identity"))
    }
    assert(e2.getMessage.contains("WHOLE partitions"), e2.getMessage)

    // a TIMESTAMP-typed hand-built start/end struct passes the shape
    // check but lacks the analyzer's window marker metadata: end is not
    // determined by start (two groups share a start), so partitioning by
    // .start alone must be refused (round-10 ADVICE)
    val fakeTs = in.toDF()
      .groupBy(struct(date_trunc("day", col("ts")).as("start"),
        col("ts").as("end")).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p", col("w.start")).drop("w")
    val e3 = intercept[IllegalArgumentException] {
      IcebergStreamSink.startOverwrite(fakeTs, dir.toString + "/t3",
        dir.toString + "/ckpt3", partitionBy = Seq("p" -> "identity"))
    }
    assert(e3.getMessage.contains("WHOLE partitions"), e3.getMessage)
  }

  test("Iceberg UPSERT sink: merge-by-key CDC ingestion with last-write-wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.iceberg.IcebergScan
    import graft.streaming.IcebergStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_upsink_")
    val table = dir.toString + "/t"
    val in = MemoryStream[Event]
    val q = IcebergStreamSink.startUpsert(in.toDF(), table, dir.toString + "/ckpt",
      keys = Seq("user_id"), latestBy = Some("ts"))
    try {
      // batch 0 creates the table; user 1 appears TWICE — event-time
      // last-write-wins picks the 10:30 row
      in.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:30:00"), 1, "view", 5.0),
        Event(3, ts("2026-01-01 10:10:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val after0 = IcebergScan.scan(spark, table)
      assert(after0.count() === 2)
      assert(after0.filter($"user_id" === 1).head().getAs[Double]("value") === 5.0)

      // batch 1 upserts user 2 and inserts user 3
      in.addData(
        Event(4, ts("2026-01-01 11:00:00"), 2, "purchase", 9.0),
        Event(5, ts("2026-01-01 11:05:00"), 3, "click", 1.5))
      q.processAllAvailable()
      val after1 = IcebergScan.scan(spark, table)
      assert(after1.count() === 3)
      assert(after1.filter($"user_id" === 2).head().getAs[Double]("value") === 9.0)

      // replayed batch must not re-merge (exactly-once via summary ids)
      val snapsBefore = IcebergScan.snapshots(spark, table).count()
      IcebergStreamSink.commitBatchUpsert(
        Seq(Event(4, ts("2026-01-01 11:00:00"), 2, "purchase", 9.0)).toDF(),
        batchId = 1, table, keys = Seq("user_id"))
      assert(IcebergScan.snapshots(spark, table).count() === snapsBefore)
      assert(IcebergScan.scan(spark, table).count() === 3)
    } finally q.stop()
  }
}
