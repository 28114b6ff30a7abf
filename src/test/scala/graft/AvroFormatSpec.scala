package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{AvroFiles, IcebergScan, IcebergWriter}

/** Avro data files — Iceberg's third data format (engine extension; the
  * reference reads parquet only; no Spark avro module ships in this
  * deployment, so [[AvroFiles]] bridges on avro-1.12.1 directly):
  * avro-format appends, mixed-format tables, partition pruning (avro
  * containers carry no column stats, so tuple pruning is the pruning
  * story), BOTH delete flavors (avro rows have real positions — the
  * bridge reads files sequentially, one task per file), typed
  * round-trips, foreign-lake migration, and the format-default
  * property. */
class AvroFormatSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-avro").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idsDF(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id").withColumn("label", concat(lit("row-"), col("id")))
  }

  test("an avro-format table round-trips through write and scan") {
    val table = tmp("graft_avro_rt_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3), table, dataFormat = Some("avro"))
    val rows = IcebergScan.scan(spark, table)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "row-1"), (2L, "row-2"), (3L, "row-3")))
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).distinct
    assert(formats.toSeq === Seq("AVRO"))
  }

  test("mixed parquet + orc + avro appends scan as one table") {
    val table = tmp("graft_avro_mixed_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)                        // parquet
    IcebergWriter.write(idsDF(3), table, dataFormat = Some("avro"))
    IcebergWriter.write(idsDF(4), table, dataFormat = Some("orc"))
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).sorted.distinct
    assert(formats.toSeq === Seq("AVRO", "ORC", "PARQUET"))
    // incremental windows cross all format boundaries
    val first = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").head().getAs[Long]("snapshot_id")
    assert(IcebergScan.incrementalAppend(spark, table, first)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
  }

  test("partition tuples prune avro files (no column stats needed)") {
    import spark.implicits._
    val table = tmp("graft_avro_prune_") + "/t"
    val df = (1 to 60).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    IcebergWriter.write(df, table, partitionBy = Seq("grp" -> "identity"),
      dataFormat = Some("avro"))
    val all = IcebergScan.scan(spark, table, IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    val kept = IcebergScan.scanFiltered(spark, table, col("grp") === "g1",
      IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    assert(kept < all, s"pruning kept $kept of $all")
    assert(IcebergScan.scanFiltered(spark, table, col("grp") === "g1")
      .count() === 20)
  }

  test("POSITION deletes work over avro (the bridge emits row positions)") {
    import spark.implicits._
    val table = tmp("graft_avro_mor_") + "/t"
    IcebergWriter.write(idsDF(1L to 10L: _*), table, dataFormat = Some("avro"))
    // unlike ORC, avro rows carry real positions: a predicate delete
    // (position-based MoR) applies, no loud failure needed
    IcebergWriter.delete(spark, table, col("id") <= 3)
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === (4L to 10L))
    // equality deletes compose on top
    IcebergWriter.deleteEquality(spark, table, Seq(10L).toDF("id"))
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === (4L to 9L))
  }

  test("v3 deletion vectors apply over avro data files") {
    val table = tmp("graft_avro_dv_") + "/t"
    IcebergWriter.write(idsDF(1L to 12L: _*), table,
      dataFormat = Some("avro"), formatVersion = 3)
    IcebergWriter.delete(spark, table, col("id") % 3 === 0)
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (1L to 12L).filterNot(_ % 3 == 0))
    // a second delete merges into the live DVs (at most one per file)
    IcebergWriter.delete(spark, table, col("id") === 1)
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (2L to 12L).filterNot(_ % 3 == 0))
    val dvs = IcebergScan.scan(spark, table,
        IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "delete").collect().map(_.getString(0))
    assert(dvs.nonEmpty && dvs.forall(_.endsWith(".puffin")), dvs.toSeq)
  }

  test("typed round-trip matches a parquet table of the same rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha", 1.5, java.sql.Date.valueOf("2024-01-01"),
        java.time.LocalDateTime.of(2024, 1, 1, 10, 30, 0),
        new java.math.BigDecimal("123.45"), Array[Byte](1, 2, 3)),
      (2L, null: String, -2.5, null: java.sql.Date,
        null: java.time.LocalDateTime,
        null: java.math.BigDecimal, null: Array[Byte]))
      .toDF("id", "name", "score", "d", "ts", "dec", "blob")
      .withColumn("dec", col("dec").cast("decimal(9,2)"))
    val pq = tmp("graft_avro_par_p_") + "/t"
    val av = tmp("graft_avro_par_a_") + "/t"
    IcebergWriter.write(rows, pq)
    IcebergWriter.write(rows, av, dataFormat = Some("avro"))
    def canon(t: String) = IcebergScan.scan(spark, t)
      .withColumn("blob", hex(col("blob")))
      .withColumn("dec", col("dec").cast("string"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(canon(av) === canon(pq))
  }

  test("addFiles migrates a foreign avro lake in place") {
    import spark.implicits._
    val source = tmp("graft_avro_mig_src_")
    val df = (1 to 50).map(i => (i.toLong, s"n$i", i * 2.0))
      .toDF("id", "name", "score")
    // foreign-style files: raw avro containers, no Iceberg metadata
    AvroFiles.writePartitioned(df.repartition(3),
      new org.apache.hadoop.fs.Path(source), Seq.empty)
    val table = tmp("graft_avro_mig_tbl_") + "/t"
    val n = IcebergWriter.addFiles(spark, table, source, dataFormat = "avro")
    assert(n > 0)
    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 50)
    assert(got.agg(sum("score")).head().getDouble(0) === (1 to 50).map(_ * 2.0).sum)
    // zero copy: planned data files still live under the source dir
    val files = IcebergScan.scan(spark, table,
      IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(source)))
    // appends after migration compose across generations
    IcebergWriter.write(Seq((99L, "new", 0.5)).toDF("id", "name", "score"), table)
    assert(IcebergScan.scan(spark, table).count() === 51)
  }

  test("non-ASCII string partition values round-trip (byte-wise %XX escaping)") {
    import spark.implicits._
    // '日本' is outside Latin-1 (code-point escaping would corrupt it);
    // '%', '+', ' ' and an astral-plane emoji cover the escape edge cases
    val nonAscii = Seq("日本", "café", "😀ok")
    // Spark's parquet writer emits literal UTF-8 dir names, which this
    // container's POSIX-locale JVM cannot create — the avro bridge's
    // byte-escaping yields pure-ASCII dirs, so it runs the full set
    val byFmt = Map(
      "avro" -> (nonAscii ++ Seq("a%2Fb", "x + y")),
      "parquet" -> Seq("a%2Fb", "x + y"))
    for ((fmt, vals) <- byFmt) {
      val df = vals.zipWithIndex.flatMap { case (g, i) =>
        Seq((i.toLong * 2, g), (i.toLong * 2 + 1, g))
      }.toDF("id", "grp")
      val table = tmp(s"graft_nonascii_${fmt}_") + "/t"
      IcebergWriter.write(df, table, partitionBy = Seq("grp" -> "identity"),
        dataFormat = Some(fmt))
      for (g <- vals) {
        val got = IcebergScan.scanFiltered(spark, table, col("grp") === g)
          .select("id", "grp").collect()
        assert(got.length === 2, s"[$fmt] partition '$g' lost rows")
        assert(got.forall(_.getString(1) == g),
          s"[$fmt] partition value corrupted: ${got.map(_.getString(1)).toSeq}")
      }
      // the manifests' partition tuples still prune correctly
      val kept = IcebergScan.scanFiltered(spark, table, col("grp") === vals.head,
        IcebergScan.Options(mode = "list_files"))
        .filter(col("type") === "data").count()
      val all = IcebergScan.scan(spark, table,
        IcebergScan.Options(mode = "list_files"))
        .filter(col("type") === "data").count()
      assert(kept < all, s"[$fmt] pruning kept $kept of $all")
    }
  }

  test("avro write commits through staging: no staging dirs or partials remain") {
    import spark.implicits._
    val table = tmp("graft_avro_commit_") + "/t"
    val df = (1 to 40).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
    IcebergWriter.write(df.repartition(4), table,
      partitionBy = Seq("grp" -> "identity"), dataFormat = Some("avro"))
    val dataDir = new org.apache.hadoop.fs.Path(table, "data")
    val fs = dataDir.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(dataDir, true)
    while (it.hasNext) {
      val p = it.next().getPath.toString
      assert(!p.contains(AvroFiles.StagingPrefix),
        s"staging output leaked into the data dir: $p")
    }
    assert(IcebergScan.scan(spark, table).count() === 40)
    // partial consumption (limit) must not break subsequent full scans —
    // readers close with the task, not only on iterator drain
    assert(IcebergScan.scan(spark, table).limit(5).collect().length === 5)
    assert(IcebergScan.scan(spark, table).count() === 40)
  }

  test("column pruning reaches the avro decoder (DataSource V2 pushdown)") {
    import spark.implicits._
    val table = tmp("graft_avro_prunecol_") + "/t"
    val wide = (1 to 30).map(i =>
      (i.toLong, s"n$i", i * 1.5, s"text-$i" * 10, i % 7, s"extra-$i"))
      .toDF("id", "name", "score", "body", "bucket", "extra")
    IcebergWriter.write(wide, table, dataFormat = Some("avro"))
    def avroScans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.description().startsWith("graft-avro-files") => b.scan
      }
    // narrow projection: the scan's read schema is the projection only
    val narrow = IcebergScan.scan(spark, table).select("id", "score")
    val scans = avroScans(narrow)
    assert(scans.nonEmpty, "no graft-avro v2 scan in the plan")
    assert(scans.forall(_.readSchema().fieldNames.toSeq === Seq("id", "score")),
      scans.map(_.readSchema().catalogString).mkString("; "))
    assert(narrow.agg(sum("score")).head().getDouble(0) ===
      (1 to 30).map(_ * 1.5).sum)
    // count(*): zero columns decode
    val count = IcebergScan.scan(spark, table).groupBy().count()
    assert(avroScans(count).forall(_.readSchema().isEmpty))
    assert(count.head().getLong(0) === 30)
    // MoR deletes: pruning composes with the anti-join's meta columns
    IcebergWriter.delete(spark, table, col("bucket") === 0)
    val afterDelete = IcebergScan.scan(spark, table).select("id")
    assert(afterDelete.collect().map(_.getLong(0)).sorted.toSeq ===
      (1 to 30).filter(_ % 7 != 0).map(_.toLong))
  }

  test("filter pushdown reaches the avro decode loop (round 10)") {
    import spark.implicits._
    val table = tmp("graft_avro_pushfilter_") + "/t"
    val df = (1 to 200).map(i =>
      (i.toLong, s"name-$i", i % 10, if (i % 50 == 0) null else s"v$i"))
      .toDF("id", "name", "bucket", "opt")
    IcebergWriter.write(df, table, dataFormat = Some("avro"))

    def avroScans(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.description().startsWith("graft-avro-files") => b.scan
      }
    val filtered = IcebergScan.scan(spark, table)
      .filter(col("bucket") === 3 && col("id") > 20L)
    // the plan advertises what the reader will evaluate
    val descs = avroScans(filtered).map(_.description())
    assert(descs.nonEmpty && descs.forall(d =>
      d.contains("PushedFilters: [") && d.contains("bucket")), descs.mkString)

    val (r0, e0) = graft.iceberg.AvroDataSource.decoderStats
    val got = filtered.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (1 to 200).filter(i => i % 10 == 3 && i > 20).map(_.toLong))
    val (r1, e1) = graft.iceberg.AvroDataSource.decoderStats
    // all 200 records decode (one container), but only matches cross
    // the DSv2 boundary — the residual Filter sees pre-filtered rows
    assert(r1 - r0 >= 200L)
    assert(e1 - e0 === got.size.toLong,
      s"decoder emitted ${e1 - e0} rows for ${got.size} matches")

    // null-check + IN + string equality compose; results stay exact
    val (r2, e2) = graft.iceberg.AvroDataSource.decoderStats
    assert(IcebergScan.scan(spark, table)
      .filter(col("opt").isNull).count() === 4)
    val (_, e3) = graft.iceberg.AvroDataSource.decoderStats
    assert(e3 - e2 === 4L)
    assert(IcebergScan.scan(spark, table)
      .filter(col("name").isin("name-7", "name-8", "name-999")).count() === 2)
    // unfiltered scans are untouched: every record emits
    val (r4, e4) = graft.iceberg.AvroDataSource.decoderStats
    assert(IcebergScan.scan(spark, table).count() === 200)
    val (r5, e5) = graft.iceberg.AvroDataSource.decoderStats
    assert(e5 - e4 === r5 - r4)

    // MoR composition: pushed filters never disturb row positions, so
    // position deletes still subtract exactly
    IcebergWriter.delete(spark, table, col("id") % 4 === 3)
    assert(IcebergScan.scan(spark, table)
      .filter(col("bucket") === 3).count() === 10) // ids ≡3 (mod 20) deleted

    // binary IN must NOT push down (Array[Byte] in a Set compares by
    // reference — the matcher would silently drop every match); the
    // residual filter answers it correctly instead (round-10 review)
    val bt = tmp("graft_avro_binin_") + "/t"
    val bdf = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3, 4)),
      (3L, Array[Byte](5, 6))).toDF("id", "b")
    IcebergWriter.write(bdf, bt, dataFormat = Some("avro"))
    assert(IcebergScan.scan(spark, bt)
      .filter(col("b").isin(Array[Byte](1, 2), Array[Byte](5, 6)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // binary EQUALITY pushes down fine (interpreted ordering compares contents)
    assert(IcebergScan.scan(spark, bt)
      .filter(col("b") === Array[Byte](3, 4)).count() === 1)
  }

  test("pushed Eq/In on float/double match -0.0 like Spark does (round 11)") {
    import spark.implicits._
    // Spark's UnsafeRow normalizes -0.0 to 0.0, so EqualTo(d, 0.0)
    // matches a stored -0.0. The pushed decode-loop matcher must not be
    // stricter — a row skipped in the decoder never reaches the
    // residual filter (silent row loss).
    val table = tmp("graft_avro_negzero_") + "/t"
    val df = Seq(
      (1L, 0.0d, 0.0f), (2L, -0.0d, -0.0f),
      (3L, 1.5d, 1.5f), (4L, -1.5d, -1.5f))
      .toDF("id", "d", "f")
    IcebergWriter.write(df, table, dataFormat = Some("avro"))

    def ids(dfq: org.apache.spark.sql.DataFrame): Seq[Long] =
      dfq.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val scan = IcebergScan.scan(spark, table)
    assert(ids(scan.filter(col("d") === 0.0d)) === Seq(1L, 2L))
    assert(ids(scan.filter(col("d") === -0.0d)) === Seq(1L, 2L))
    assert(ids(scan.filter(col("f") === 0.0f)) === Seq(1L, 2L))
    assert(ids(scan.filter(col("d").isin(0.0d, 1.5d))) === Seq(1L, 2L, 3L))
    assert(ids(scan.filter(col("f").isin(-0.0f))) === Seq(1L, 2L))
    // ordering comparisons agree with Spark on the normalized value
    assert(ids(scan.filter(col("d") >= 0.0d)) === Seq(1L, 2L, 3L))
    assert(ids(scan.filter(col("d") < 0.0d)) === Seq(4L))
  }

  test("split_offsets spread a wide avro file across read tasks (round 10)") {
    import spark.implicits._
    val table = tmp("graft_avro_split_") + "/t"
    // ~8 MB of payload in ONE container → ≥4 blocks at the 2 MB sync interval
    val df = (1 to 20000).map(i => (i.toLong, "x" * 400 + i)).toDF("id", "body")
    IcebergWriter.write(df.coalesce(1), table, dataFormat = Some("avro"))

    val conf = spark.sessionState.newHadoopConf()
    val snap = IcebergScan.selectSnapshot(spark, table, IcebergScan.Options())
    graft.iceberg.ManifestReader.invalidatePlanningCache()
    val meta = graft.iceberg.ManifestReader.loadTable(
      table, snap, conf, allowMovedPaths = false)
    val entry = meta.entries.flatMap(_._2).head
    assert(entry.splitOffsets.size >= 4,
      s"expected >=4 block offsets, got ${entry.splitOffsets.size}")

    spark.conf.set("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
    try {
      val scan = IcebergScan.scan(spark, table)
      val parts = scan.select("id").rdd.getNumPartitions
      assert(parts > 1, s"wide avro file planned as $parts task(s)")
      // block tiling is exact: no row lost or doubled across range tasks
      assert(scan.count() === 20000)
      assert(scan.agg(sum("id")).head().getLong(0) === 20000L * 20001 / 2)
      // a scan that needs positions (MoR) refuses to split — deletes
      // still subtract exactly
      IcebergWriter.delete(spark, table, col("id") % 3 === 0)
      assert(IcebergScan.scan(spark, table).count() === 20000 - 6666)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("pushdown fuzz: avro filtered scans equal parquet ground truth") {
    import spark.implicits._
    // same rows in BOTH formats; nulls in every nullable column
    val rows = (1 to 300).map { i =>
      (i.toLong,
        if (i % 11 == 0) null else s"s${i % 40}",
        if (i % 13 == 0) null else java.lang.Double.valueOf((i % 17) * 1.5),
        i % 7,
        java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"),
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 0${i % 10}:30:00"))
    }
    val df = rows.toDF("id", "s", "d", "b", "dt", "ts")
    val at = tmp("graft_avro_fuzz_a_") + "/t"
    val pt = tmp("graft_avro_fuzz_p_") + "/t"
    IcebergWriter.write(df, at, dataFormat = Some("avro"))
    IcebergWriter.write(df, pt)

    val preds: Seq[org.apache.spark.sql.Column] = Seq(
      col("id") === 42L, col("id") > 250L, col("id") <= 11L,
      col("id").isin(1L, 99L, 300L, 999L),
      col("s") === "s13", col("s") > "s3", col("s") < "s1",
      col("s").isNull, col("s").isNotNull,
      col("s").isin("s0", "s39", "zzz"),
      col("d") === 6.0, col("d") >= 22.5, col("d") < 1.5,
      col("d").isNull,
      col("b") === 3, col("b") >= 5, col("b").isin(0, 6),
      col("dt") === java.sql.Date.valueOf("2024-01-05"),
      col("dt") > java.sql.Date.valueOf("2024-01-20"),
      col("ts") >= java.sql.Timestamp.valueOf("2024-01-15 00:00:00"),
      col("ts") < java.sql.Timestamp.valueOf("2024-01-03 12:00:00"),
      col("ts") === java.sql.Timestamp.valueOf("2024-01-05 04:30:00"),
      col("id") > 100L && col("b") === 2,
      col("s") >= "s2" && col("d") < 20.0,
      (col("id") < 50L) || (col("id") > 280L), // OR: not pushable, residual only
      col("id") % 9 === 0)                     // arithmetic: residual only
    def digest(table: String, p: org.apache.spark.sql.Column): (Long, Long) = {
      // xor digest: rows are id-distinct, and summing full-range hashes
      // overflows under ANSI arithmetic
      val r = IcebergScan.scan(spark, table).filter(p)
        .agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(to_json(struct(col("id"), col("s"), col("d"),
            col("b"), col("dt"), col("ts"))))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    preds.zipWithIndex.foreach { case (p, i) =>
      assert(digest(at, p) === digest(pt, p), s"predicate #$i diverged: $p")
    }
  }

  test("orphaned staging output from a dead attempt is never registered") {
    import spark.implicits._
    // a foreign avro lake whose producer crashed mid-write: a partial
    // container still sits in its staging tree — the recursive
    // collectFiles sweep behind addFiles must skip it
    val source = tmp("graft_avro_orphan_src_")
    AvroFiles.writePartitioned(idsDF(1, 2, 3),
      new org.apache.hadoop.fs.Path(source), Seq.empty)
    val conf = spark.sessionState.newHadoopConf()
    val srcDir = new org.apache.hadoop.fs.Path(source)
    val fs = srcDir.getFileSystem(conf)
    val stray = new org.apache.hadoop.fs.Path(srcDir,
      AvroFiles.StagingPrefix + "deadjob/attempt-7/part-00000-dead.avro")
    val out = fs.create(stray, false)
    out.write(Array[Byte](1, 2, 3)) // not even a valid container
    out.close()
    val table = tmp("graft_avro_orphan_tbl_") + "/t"
    IcebergWriter.addFiles(spark, table, source, dataFormat = "avro")
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
    val files = IcebergScan.files(spark, table)
      .select("file_path").collect().map(_.getString(0))
    assert(!files.exists(_.contains(AvroFiles.StagingPrefix)), files.toSeq)
  }

  test("avro scans report manifest-known statistics to the planner") {
    import spark.implicits._
    val table = tmp("graft_avro_stats_") + "/t"
    IcebergWriter.write(idsDF(1L to 100L: _*), table, dataFormat = Some("avro"))
    val df = IcebergScan.scan(spark, table)
    val stats = df.queryExecution.optimizedPlan.stats
    // a statless V2 relation would default to "huge"; the manifest sums
    // make it the small relation it really is
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 1024 * 1024,
      s"sizeInBytes=${stats.sizeInBytes}")
    // ...so a join against a larger side BROADCASTS the avro relation
    val big = (1L to 50000L).map(i => (i, i * 2.0)).toDF("id", "v")
    val joined = big.join(df, "id")
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, joined.queryExecution.executedPlan.toString.take(2000))
  }

  test("write.format.default=avro is honored when no format is passed") {
    val table = tmp("graft_avro_prop_") + "/t"
    IcebergWriter.write(idsDF(1), table, dataFormat = Some("avro"))
    val conf = spark.sessionState.newHadoopConf()
    val metaDir = new org.apache.hadoop.fs.Path(table, "metadata")
    val fs = metaDir.getFileSystem(conf)
    val v1 = new org.apache.hadoop.fs.Path(metaDir, "v1.metadata.json")
    val txt = new String(
      fs.open(v1).readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    val withProp = txt.replaceFirst("\\{",
      """{"properties":{"write.format.default":"avro"},""")
    fs.delete(v1, false)
    val out = fs.create(v1, true)
    out.write(withProp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    IcebergWriter.write(idsDF(2), table) // no dataFormat: property decides
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).distinct
    assert(formats.toSeq === Seq("AVRO"))
  }
}
