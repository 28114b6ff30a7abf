package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** V2 StreamingWrite through the catalog (round 12):
  * `writeStream.toTable("graft.db.t")` lands each micro-batch as one
  * snapshot — executor-written, field-id-stamped data files; driver-side
  * footer stats + append commit; batch-id exactly-once. The reference's
  * own test infra drives Spark through a catalog (scripts/provision.py);
  * this is the write half of that surface. */
class StreamingWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft_streamw_wh_").toString

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .appName("graft-streaming-write")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("writeStream.toTable appends one snapshot per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_sink (id BIGINT, name STRING, amount DOUBLE)")
    val in = MemoryStream[(Long, String, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "name", "amount")
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_sink")
    try {
      in.addData((1L, "a", 1.5), (2L, "b", 2.5))
      q.processAllAvailable()
      in.addData((3L, "c", 3.5))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, name, amount FROM graft.db.stream_sink ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
      // one data snapshot per non-empty batch (plus the CREATE's empty one)
      val snaps = IcebergScan.snapshots(spark, s"$wh/db/stream_sink").count()
      assert(snaps === 3L)
    } finally q.stop()
  }

  test("streaming into a PARTITIONED table routes rows per transform") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_part (ts TIMESTAMP_NTZ, user STRING, v BIGINT) " +
        "PARTITIONED BY (days(ts))")
    val in = MemoryStream[(Timestamp, String, Long)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("ts", "user", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_part")
    try {
      in.addData(
        (ts("2026-01-01 10:00:00"), "u1", 1L),
        (ts("2026-01-01 23:00:00"), "u2", 2L),
        (ts("2026-01-02 01:00:00"), "u1", 3L))
      q.processAllAvailable()
      // partition pruning proves the tuples landed: one day's files only
      val path = s"$wh/db/stream_part"
      val listing = IcebergScan.scanFiltered(
        spark, path,
        col("ts") >= lit("2026-01-02 00:00:00").cast("timestamp_ntz"),
        IcebergScan.Options(mode = "list_files"))
      val dataFiles = listing.filter(col("type") === "data").count()
      assert(dataFiles === 1L, "day-partition pruning over streamed files")
      val total = spark.sql("SELECT sum(v) FROM graft.db.stream_part")
        .head.getLong(0)
      assert(total === 6L)
    } finally q.stop()
  }

  test("epoch replay is idempotent: a committed batch id never double-lands") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.db.stream_replay (id BIGINT, v DOUBLE)")
    val path = s"$wh/db/stream_replay"
    val tbl = graft.sql.GraftTable.resolve(
      spark, "graft",
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "stream_replay"),
      path, IcebergScan.Options())
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    // drive commitStreamBatch directly with a fixed epoch id, twice:
    // second call must detect the recorded id and drop its files
    def filesFor(marker: String): Seq[(String, Map[String, Any])] = {
      val dir = new org.apache.hadoop.fs.Path(path, s"data/replay-$marker")
      df.coalesce(1).write.parquet(dir.toString)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(dir, true)
      val buf = Seq.newBuilder[(String, Map[String, Any])]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          buf += ((s.getPath.toString, Map.empty[String, Any]))
      }
      buf.result()
    }
    val key = graft.streaming.IcebergStreamSink.batchIdKey("v2-replaytest")
    IcebergWriter.commitStreamBatch(spark, path, filesFor("a"), key, 7L)
    val afterFirst = spark.sql("SELECT count(*) FROM graft.db.stream_replay")
      .head.getLong(0)
    val replayFiles = filesFor("b")
    IcebergWriter.commitStreamBatch(spark, path, replayFiles, key, 7L)
    val afterReplay = spark.sql("SELECT count(*) FROM graft.db.stream_replay")
      .head.getLong(0)
    assert(afterFirst === 2L)
    assert(afterReplay === 2L, "replayed epoch must not double-append")
    // and the replay's files were dropped (no orphan accumulation)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(replayFiles.forall { case (p, _) =>
      !fs.exists(new org.apache.hadoop.fs.Path(p)) })
    assert(tbl != null)
  }

  test("complete output mode overwrites the whole table per epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_complete (name STRING, cnt BIGINT)")
    val in = MemoryStream[(String, Long)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("name", "v")
      .groupBy("name").agg(count("*").as("cnt"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_complete")
    try {
      in.addData(("a", 1L), ("a", 2L), ("b", 3L))
      q.processAllAvailable()
      in.addData(("a", 4L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT name, cnt FROM graft.db.stream_complete ORDER BY name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // complete mode re-emits ALL groups with updated counts — the table
      // holds exactly the latest full result, not an accumulation
      assert(rows === Seq(("a", 3L), ("b", 1L)))
    } finally q.stop()
  }

  test("format(\"graft\") streaming sink: by path and by catalog identifier") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_fmt (id BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("id", "v")
      .writeStream
      .format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .option("table", "graft.db.stream_fmt")
      .start()
    try {
      in.addData((1L, 0.5), (2L, 1.5))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft.db.stream_fmt")
        .head.getLong(0) === 2L)
    } finally q.stop()
    // by path: the same sink against the table root directly
    val in2 = MemoryStream[(Long, Double)]
    val q2 = in2.toDF().toDF("id", "v")
      .writeStream
      .format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .option("path", s"$wh/db/stream_fmt")
      .start()
    try {
      in2.addData((3L, 2.5))
      q2.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft.db.stream_fmt")
        .head.getLong(0) === 3L)
    } finally q2.stop()
  }

  test("complete mode: an EMPTY epoch truncates instead of going stale") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_empty (name STRING, cnt BIGINT)")
    val in = MemoryStream[(String, Long)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("name", "v")
      .groupBy("name").agg(count("*").as("cnt"))
      .filter(col("cnt") < 2) // grows past the filter -> empty result
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_empty")
    try {
      in.addData(("a", 1L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft.db.stream_empty")
        .head.getLong(0) === 1L)
      in.addData(("a", 2L)) // cnt becomes 2 -> filtered -> EMPTY epoch
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft.db.stream_empty")
        .head.getLong(0) === 0L,
        "an empty complete-mode epoch must truncate the table")
    } finally q.stop()
  }

  test("NULL and the string 'null' route to distinct partition files") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_nullpart (k STRING, v BIGINT) " +
        "PARTITIONED BY (k)")
    val in = MemoryStream[(Option[String], Long)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("k", "v")
      .coalesce(1) // one task sees both rows — the collision scenario
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_nullpart")
    try {
      in.addData((None, 1L), (Some("null"), 2L))
      q.processAllAvailable()
      val listing = IcebergScan.scan(spark, s"$wh/db/stream_nullpart",
        IcebergScan.Options(mode = "list_files"))
        .filter(col("type") === "data").count()
      assert(listing === 2L,
        "NULL-keyed and 'null'-keyed rows must land in separate files")
      val rows = spark.sql(
        "SELECT k, v FROM graft.db.stream_nullpart ORDER BY v")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
      assert(rows === Seq((None, 1L), (Some("null"), 2L)))
    } finally q.stop()
  }

  test("streamed files carry footer stats that drive pruning (field ids)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_stats (id BIGINT, grp STRING)")
    val in = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "grp")
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_stats")
    try {
      in.addData((1L, "x"), (2L, "x"))
      q.processAllAvailable()
      in.addData((100L, "y"), (200L, "y"))
      q.processAllAvailable()
      // bounds pruning: id > 50 must skip the first epoch's file
      val listing = IcebergScan.scanFiltered(
        spark, s"$wh/db/stream_stats", col("id") > 50,
        IcebergScan.Options(mode = "list_files"))
      assert(listing.filter(col("type") === "data").count() === 1L,
        "manifest bounds from streamed footers must prune the other epoch")
    } finally q.stop()
  }

  // ---- CDC-apply (upsert) streaming — round 13, gate ib63 ---------------

  test("update mode + upsert-keys: each epoch's row replaces its key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_upsert (id BIGINT, name STRING, v DOUBLE)")
    val in = MemoryStream[(Long, String, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "name", "v")
      .writeStream
      .outputMode("update")
      .option("upsert-keys", "id")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_upsert")
    try {
      in.addData((1L, "a", 10.0), (2L, "b", 20.0))
      q.processAllAvailable()
      in.addData((1L, "a2", 11.0), (3L, "c", 30.0))
      q.processAllAvailable()
      in.addData((2L, "b2", 21.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, name, v FROM graft.db.stream_upsert ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "a2", 11.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
      val path = s"$wh/db/stream_upsert"
      // one MoR snapshot per epoch (plus CREATE)
      assert(IcebergScan.snapshots(spark, path).count() === 4L)
      // the upsert epochs wrote equality-delete files, no data rewrite:
      // all 3 data files (one per epoch — MemoryStream delivers a batch
      // as one input partition) remain live. The PRUNED listing shows 2
      // delete files — epoch 1's delete scopes to strictly-older data,
      // of which there is none, so the scan correctly drops it.
      val listing = IcebergScan.scan(
        spark, path, IcebergScan.Options(mode = "list_files"))
      assert(listing.filter(col("type") === "delete").count() === 2L)
      assert(listing.filter(col("type") === "data").count() === 3L)
    } finally q.stop()
  }

  test("upsert replay is idempotent and a dup-key epoch fails clean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_upsert2 (id BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    def start() = in.toDF().toDF("id", "v")
      .writeStream
      .outputMode("update")
      .option("upsert-keys", "id")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_upsert2")
    val q = start()
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
    } finally q.stop()
    // restart from the same checkpoint: Spark replays the last epoch; the
    // recorded epoch id must make the re-commit a no-op
    val path = s"$wh/db/stream_upsert2"
    val snapsBefore = IcebergScan.snapshots(spark, path).count()
    val q2 = start()
    try {
      in.addData((2L, 2.5))
      q2.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, v FROM graft.db.stream_upsert2 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 1.0), (2L, 2.5)))
      // exactly ONE new snapshot for the new epoch — a replayed epoch
      // re-commit would have added another
      assert(IcebergScan.snapshots(spark, path).count() === snapsBefore + 1)
    } finally q2.stop()
    // duplicate keys inside one epoch: the commit must fail (both rows
    // would survive — the delete only reaches older sequence numbers)
    val in3 = MemoryStream[(Long, Double)]
    val ckpt3 = Files.createTempDirectory("graft_ckpt_").toString
    val q3 = in3.toDF().toDF("id", "v")
      .writeStream
      .outputMode("update")
      .option("upsert-keys", "id")
      .option("checkpointLocation", ckpt3)
      .toTable("graft.db.stream_upsert2")
    try {
      in3.addData((7L, 1.0), (7L, 2.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(e.getMessage.contains("more than one row for the same key") ||
        Option(e.getCause).exists(_.getMessage
          .contains("more than one row for the same key")))
      // nothing landed: table state unchanged
      val rows = spark.sql(
        "SELECT id, v FROM graft.db.stream_upsert2 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 1.0), (2L, 2.5)))
    } finally q3.stop()
  }

  test("upsert whose key CHANGES partition still replaces (global delete)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_upsert_part " +
        "(id BIGINT, region STRING, v BIGINT) PARTITIONED BY (region)")
    val in = MemoryStream[(Long, String, Long)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "region", "v")
      .writeStream
      .outputMode("update")
      .option("upsert-keys", "id")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_upsert_part")
    try {
      in.addData((1L, "emea", 1L), (2L, "apac", 2L))
      q.processAllAvailable()
      // key 1 moves emea -> apac: the equality delete is written under
      // the UNPARTITIONED spec, so it reaches the old row across
      // partitions — the Flink-upsert failure mode handled correctly
      in.addData((1L, "apac", 10L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, region, v FROM graft.db.stream_upsert_part ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows === Seq((1L, "apac", 10L), (2L, "apac", 2L)))
    } finally q.stop()
  }

  test("write.upsert.key-columns table property enables upsert without option") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      "CREATE TABLE graft.db.stream_upsert_prop (id BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('write.upsert.key-columns'='id')")
    val in = MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "v")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_upsert_prop")
    try {
      in.addData((1L, 1.0)); q.processAllAvailable()
      in.addData((1L, 9.0)); q.processAllAvailable()
      val rows = spark.sql("SELECT id, v FROM graft.db.stream_upsert_prop")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 9.0)))
    } finally q.stop()
  }

  test("upsert-keys='' opts a stream out of an upsert table's property") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the property makes this an UPSERT TABLE for every stream (Spark
    // gives the builder no output-mode signal, so the property cannot be
    // update-mode-scoped); a plain append feed must opt out explicitly
    spark.sql(
      "CREATE TABLE graft.db.stream_upsert_opt (id BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('write.upsert.key-columns'='id')")
    val in = MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "v")
      .writeStream
      .option("upsert-keys", "")
      .option("checkpointLocation", ckpt)
      .toTable("graft.db.stream_upsert_opt")
    try {
      in.addData((1L, 1.0)); q.processAllAvailable()
      // same key again: with the property active this would replace; the
      // opt-out makes it a plain append, so both versions survive
      in.addData((1L, 2.0)); q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM graft.db.stream_upsert_opt")
        .head.getLong(0) === 2L)
    } finally q.stop()
  }

  test("upsert-change-column: tombstone rows delete, others replace") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_cdc (id BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double, String)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    // the change column is feed metadata (not a table column), so the
    // feed goes through format("graft") where the write schema is the
    // query's own — toTable would reject the extra column at analysis
    val q = in.toDF().toDF("id", "v", "_ct")
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.stream_cdc")
      .option("upsert-keys", "id")
      .option("upsert-change-column", "_ct")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, 1.0, "insert"), (2L, 2.0, "insert"), (3L, 3.0, "insert"))
      q.processAllAvailable()
      // one epoch mixing a true delete, an update, and an insert
      in.addData((1L, 0.0, "delete"), (2L, 2.5, "update_postimage"),
        (4L, 4.0, "insert"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, v FROM graft.db.stream_cdc ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((2L, 2.5), (3L, 3.0), (4L, 4.0)))
      // delete-only epoch: commits a pure-delete snapshot
      in.addData((3L, 0.0, "D"))
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM graft.db.stream_cdc ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(2L, 4L))
      // tombstone scratch files were reclaimed (only table files remain)
      val dataDir = new java.io.File(s"$wh/db/stream_cdc/data")
      def tombs(d: java.io.File): Seq[String] =
        Option(d.listFiles).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) tombs(f)
          else if (f.getName.contains("-tomb")) Seq(f.getName) else Seq.empty)
      assert(tombs(dataDir).isEmpty, s"tombstone scratch left: ${tombs(dataDir)}")
    } finally q.stop()
  }

  test("multi-column upsert-keys listed in NON-table order tombstone the right row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same-typed key columns so a column-order swap is silent: with the
    // tombstone scratch schema in table order (a,b) but the projection in
    // upsert-keys order (b,a), deleting (a=1,b=2) would write values
    // (2,1) under names (a,b) and delete the WRONG row (a=2,b=1)
    spark.sql(
      "CREATE TABLE graft.db.stream_cdc_rev (a BIGINT, b BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Long, Double, String)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("a", "b", "v", "_ct")
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.stream_cdc_rev")
      .option("upsert-keys", "b,a") // REVERSED vs table column order
      .option("upsert-change-column", "_ct")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, 2L, 12.0, "insert"), (2L, 1L, 21.0, "insert"))
      q.processAllAvailable()
      in.addData((1L, 2L, 0.0, "delete"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT a, b, v FROM graft.db.stream_cdc_rev ORDER BY a")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows === Seq((2L, 1L, 21.0)),
        "tombstone (a=1,b=2) must delete that row, not its swap (a=2,b=1)")
    } finally q.stop()
  }

  test("CDC source -> upsert sink replicates a mutating table end-to-end") {
    import spark.implicits._
    // SOURCE: an Iceberg table that lives through appends, a keyed merge
    // (update+insert) and a row-level delete
    val src = Files.createTempDirectory("graft_cdc_src_").toString + "/t"
    val t0 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amt")
    IcebergWriter.write(t0, src)
    IcebergWriter.merge(spark, src,
      Seq((2L, "b2", 21.0), (4L, "d", 40.0)).toDF("id", "name", "amt"),
      keyCols = Seq("id"))
    IcebergWriter.delete(spark, src, col("id") === 1L)
    // MIRROR: change feed -> keyed apply. One source snapshot per epoch
    // keeps the feed's delete/insert ordering aligned with epochs (a
    // multi-snapshot epoch could fold a later delete of key k into the
    // same equality delete as k's own earlier insert).
    spark.sql("CREATE TABLE graft.db.cdc_mirror (id BIGINT, name STRING, amt DOUBLE)")
    val q = spark.readStream
      .format("graft-iceberg")
      .option("path", src)
      .option("mode", "cdc")
      .option("max-snapshots-per-trigger", "1")
      .load()
      .select(col("id"), col("name"), col("amt"),
        col("_change_type").as("_ct"))
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.cdc_mirror")
      .option("upsert-keys", "id")
      .option("upsert-change-column", "_ct")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .start()
    try {
      q.processAllAvailable()
      val mirror = spark.sql(
        "SELECT id, name, amt FROM graft.db.cdc_mirror ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val source = IcebergScan.scan(spark, src)
        .select("id", "name", "amt").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(mirror === source)
      assert(mirror === Seq((2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    } finally q.stop()
  }

  test("upsert-ordinal-column resolves multi-action keys to the LAST action") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_cdc_ord (k BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double, Long, String)]
    val q = in.toDF().toDF("k", "v", "_ord", "_ct")
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.stream_cdc_ord")
      .option("upsert-keys", "k")
      .option("upsert-change-column", "_ct")
      .option("upsert-ordinal-column", "_ord")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .start()
    try {
      in.addData((1L, 1.0, 0L, "insert"), (2L, 2.0, 0L, "insert"),
        (3L, 3.0, 0L, "insert"), (4L, 4.0, 0L, "insert"), (5L, 5.0, 0L, "insert"))
      q.processAllAvailable()
      // ONE epoch carrying several actions per key — the shapes the
      // strictly-older equality delete cannot order by itself:
      in.addData(
        (1L, 10.0, 1L, "insert"), (1L, 11.0, 2L, "update"), // multi-upsert → last
        (2L, 20.0, 1L, "update"), (2L, 0.0, 2L, "delete"),  // insert THEN delete → gone
        (3L, 0.0, 1L, "delete"), (3L, 30.0, 2L, "insert"),  // delete then re-insert
        (4L, 0.0, 5L, "delete"), (4L, 40.0, 5L, "update"))  // TIE → data wins (CDC pair)
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, v FROM graft.db.stream_cdc_ord ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 11.0), (3L, 30.0), (4L, 40.0), (5L, 5.0)),
        s"got $rows")
    } finally q.stop()
  }

  test("CDC source: a MULTI-snapshot epoch replicates via the commit ordinal") {
    import spark.implicits._
    // append, keyed merge, then a DELETE — all batched into ONE sink
    // epoch (no max-snapshots-per-trigger pacing). _commit_snapshot_id is
    // monotone for graft-written sources, so it serves as the ordinal;
    // without it, k=1's delete (a LATER snapshot than its insert) would
    // fold into the same equality delete as the insert and k=1 would
    // wrongly survive.
    val src = Files.createTempDirectory("graft_cdc_ord_src_").toString + "/t"
    IcebergWriter.write(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), src)
    IcebergWriter.merge(spark, src,
      Seq((2L, 21.0), (3L, 30.0)).toDF("k", "v"), keyCols = Seq("k"))
    IcebergWriter.delete(spark, src, col("k") === 1L)
    spark.sql("CREATE TABLE graft.db.cdc_ord_mirror (k BIGINT, v DOUBLE)")
    val q = spark.readStream
      .format("graft-iceberg")
      .option("path", src)
      .option("mode", "cdc")
      .load()
      .select(col("k"), col("v"),
        col("_change_type").as("_ct"),
        col("_commit_snapshot_id").as("_ord"))
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.cdc_ord_mirror")
      .option("upsert-keys", "k")
      .option("upsert-change-column", "_ct")
      .option("upsert-ordinal-column", "_ord")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .start()
    try {
      q.processAllAvailable()
      val mirror = spark.sql("SELECT k, v FROM graft.db.cdc_ord_mirror ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val source = IcebergScan.scan(spark, src).select("k", "v").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(mirror === source)
      assert(mirror === Seq((2L, 21.0), (3L, 30.0)))
    } finally q.stop()
  }

  test("durable upsert/ordinal table properties do not break BATCH inserts") {
    // the clustered+sorted distribution the ordinal mode declares must be
    // gated on the ordinal column being IN the write schema: a plain
    // batch INSERT carries only table columns, and an unconditional
    // declaration would fail its analysis trying to sort by the feed's
    // metadata column
    spark.sql(
      """CREATE TABLE graft.db.ord_props (k BIGINT, v DOUBLE)
        |TBLPROPERTIES (
        |  'write.upsert.key-columns' = 'k',
        |  'write.upsert.change-column' = '_ct',
        |  'write.upsert.ordinal-column' = '_ord')""".stripMargin)
    spark.sql("INSERT INTO graft.db.ord_props VALUES (1, 1.0), (2, 2.0)")
    assert(spark.sql("SELECT count(*) FROM graft.db.ord_props").head.getLong(0) === 2L)
  }

  test("a NULL ordinal fails the epoch loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_ord_null (k BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double, Option[Long], String)]
    val q = in.toDF().toDF("k", "v", "_ord", "_ct")
      .writeStream
      .outputMode("update")
      .format("graft")
      .option("table", "graft.db.stream_ord_null")
      .option("upsert-keys", "k")
      .option("upsert-change-column", "_ct")
      .option("upsert-ordinal-column", "_ord")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .start()
    try {
      in.addData((1L, 1.0, None, "insert"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("ordinal") ||
        Option(e.getCause).exists(_.getMessage.contains("ordinal")), e.getMessage)
    } finally q.stop()
  }

  test("an unknown upsert key column fails the stream at start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE graft.db.stream_upsert_bad (id BIGINT, v DOUBLE)")
    val in = MemoryStream[(Long, Double)]
    def tryStart(mode: String, keys: String): Throwable = {
      val ckpt = Files.createTempDirectory("graft_ckpt_").toString
      val q = in.toDF().toDF("id", "v")
        .writeStream
        .outputMode(mode)
        .option("upsert-keys", keys)
        .option("checkpointLocation", ckpt)
        .toTable("graft.db.stream_upsert_bad")
      try {
        in.addData((1L, 1.0))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    // complete mode needs an aggregation to be allowed at all — use the
    // update path for both negative shapes instead
    val e1 = tryStart("update", "nope")
    assert(e1.getMessage.contains("not in the write schema") ||
      Option(e1.getCause).exists(_.getMessage.contains("not in the write schema")))
  }
}
