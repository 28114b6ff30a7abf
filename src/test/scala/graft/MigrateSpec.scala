package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options
import graft.iceberg.IcebergPruning.{ColPredicate, Eq, Gt}

/** `addFiles` — migrate-in-place: register existing FOREIGN parquet files
  * (no `parquet.field.id` stamping — the exact files a pre-Iceberg data
  * lake holds) into a table without copying or rewriting them. The spec's
  * `schema.name-mapping.default` property flips the scan to name-based
  * column resolution; appends, MoR deletes, pruning and maintenance all
  * compose on top. */
class MigrateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-migrate").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Foreign-style source: plain Spark parquet WITHOUT field ids (bare
    * toDF().write.parquet — unreadable by the id-keyed scan path). */
  private def writeForeign(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  private def src(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"name-$i", i * 10.0)).toDF("id", "name", "score")
  }

  test("addFiles registers foreign files in place: rows exact, zero copy") {
    val source = tmp("graft_mig_src_")
    writeForeign(src(100).repartition(4), source)
    val table = tmp("graft_mig_tbl_") + "/t"

    IcebergWriter.addFiles(spark, table, source)

    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 100)
    assert(got.agg(sum("score")).head().getDouble(0) === src(100).agg(sum("score")).head().getDouble(0))
    // zero copy: every planned data file still lives under the SOURCE dir
    val files = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data").collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(source)), files.mkString("\n"))
    // the spec property is recorded
    val snap = IcebergScan.loadInfo(spark, table)
    assert(snap.properties.contains(IcebergWriter.NameMappingProp))
  }

  test("appends after migration compose: both generations read under one scan") {
    val source = tmp("graft_mig_src2_")
    writeForeign(src(50), source)
    val table = tmp("graft_mig_tbl2_") + "/t"
    IcebergWriter.addFiles(spark, table, source)

    import spark.implicits._
    val extra = Seq((1000L, "new-1", 1.5), (1001L, "new-2", 2.5)).toDF("id", "name", "score")
    IcebergWriter.write(extra, table)

    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 52)
    assert(got.filter(col("id") >= 1000L).count() === 2)
    assert(got.filter(col("id") <= 50L).agg(sum("id")).head().getLong(0) === (1L to 50L).sum)
  }

  test("MoR delete on a migrated table tombstones foreign rows without rewrite") {
    val source = tmp("graft_mig_src3_")
    writeForeign(src(40).repartition(2), source)
    val table = tmp("graft_mig_tbl3_") + "/t"
    IcebergWriter.addFiles(spark, table, source)

    IcebergWriter.delete(spark, table, col("id") % 2 === 0)
    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 20)
    assert(got.filter(col("id") % 2 === 0).count() === 0)
    // the foreign data files are untouched (delete files are additive)
    val files = IcebergScan.scan(spark, table, Options(mode = "list_files")).collect()
    assert(files.count(_.getString(1) === "data") === 2)
    assert(files.count(_.getString(1) === "delete") >= 1)
  }

  test("footer bounds recorded at migration prune foreign files") {
    val source = tmp("graft_mig_src4_")
    // four files covering disjoint id ranges -> tight footer bounds
    val parts = Seq((1, 25), (26, 50), (51, 75), (76, 100))
    parts.zipWithIndex.foreach { case ((lo, hi), i) =>
      import spark.implicits._
      writeForeign((lo to hi).map(v => (v.toLong, s"n$v", v * 1.0))
        .toDF("id", "name", "score").coalesce(1), s"$source/part$i")
    }
    val table = tmp("graft_mig_tbl4_") + "/t"
    IcebergWriter.addFiles(spark, table, source)

    val all = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    assert(all === 4)
    val pruned = IcebergScan.scan(spark, table, Options(mode = "list_files",
      filters = Seq(ColPredicate("id", Gt, 80L))))
      .filter(col("type") === "data").count()
    assert(pruned === 1, s"expected 1 file after bounds pruning, got $pruned")
    assert(IcebergScan.scan(spark, table,
      Options(filters = Seq(ColPredicate("id", Gt, 80L)))).count() === 20)
  }

  test("hive-layout source with retained partition columns registers tuples") {
    val source = tmp("graft_mig_src5_")
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, s"cat${i % 3}", i * 2.0))
      .toDF("id", "cat", "score")
    // hive dirs with the partition column RETAINED in the files
    (0 to 2).foreach { c =>
      writeForeign(df.filter(col("cat") === s"cat$c").coalesce(1), s"$source/cat=cat$c")
    }
    val table = tmp("graft_mig_tbl5_") + "/t"
    IcebergWriter.addFiles(spark, table, source, partitionBy = Seq("cat" -> "identity"))

    assert(IcebergScan.scan(spark, table).count() === 60)
    // partition-tuple pruning: a cat filter plans exactly one file
    val pruned = IcebergScan.scan(spark, table, Options(mode = "list_files",
      filters = Seq(ColPredicate("cat", Eq, "cat1")))).count()
    assert(pruned === 1)
    val got = IcebergScan.scan(spark, table,
      Options(filters = Seq(ColPredicate("cat", Eq, "cat1"))))
    assert(got.count() === 20)
    assert(got.select("cat").distinct().head().getString(0) === "cat1")
  }

  test("hive-stripped partition columns are rejected, not read as NULL") {
    val source = tmp("graft_mig_src6_")
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"cat${i % 2}")).toDF("id", "cat")
    // Spark's partitionBy STRIPS the column from the files — the unsafe case
    df.write.mode("overwrite").partitionBy("cat").parquet(source)
    val table = tmp("graft_mig_tbl6_") + "/t"
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.addFiles(spark, table, source,
        partitionBy = Seq("cat" -> "identity"))
    }
    assert(e.getMessage.contains("not physically present"))
  }

  test("addFiles refuses a table whose history renamed a live column") {
    // the backward-direction rename guard: files written BEFORE a
    // renameColumns store the OLD physical column name, so flipping the
    // table to name-based resolution would silently null the renamed
    // column on them
    val table = tmp("graft_mig_hist_") + "/t"
    IcebergWriter.write(src(10), table)
    IcebergWriter.renameColumns(spark, table, Map("score" -> "points"))
    val source = tmp("graft_mig_hist_src_")
    import spark.implicits._
    writeForeign((1 to 5).map(i => (i.toLong, s"n$i", i * 1.0))
      .toDF("id", "name", "points"), source)
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.addFiles(spark, table, source)
    }
    assert(e.getMessage.contains("previously named"), e.getMessage)
  }

  test("renames are blocked while the name mapping exists") {
    val source = tmp("graft_mig_src7_")
    writeForeign(src(10), source)
    val table = tmp("graft_mig_tbl7_") + "/t"
    IcebergWriter.addFiles(spark, table, source)
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.renameColumns(spark, table, Map("name" -> "label"))
    }
    assert(e.getMessage.contains("name-mapping"))
  }

  test("rowCount answers from metadata alone — even with a data file GONE") {
    val source = tmp("graft_mig_src9_")
    writeForeign(src(30).repartition(3), source)
    val table = tmp("graft_mig_tbl9_") + "/t"
    IcebergWriter.addFiles(spark, table, source)

    val fast = IcebergScan.rowCount(spark, table).head()
    assert(fast.getLong(0) === 30)
    assert(fast.getBoolean(1), "expected the metadata-only fast path")

    // the proof of zero data I/O: physically remove a registered data
    // file — the metadata count still answers (a scan would now fail)
    val victim = IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data").head().getString(0)
    val p = new org.apache.hadoop.fs.Path(victim)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    val still = IcebergScan.rowCount(spark, table).head()
    assert(still.getLong(0) === 30 && still.getBoolean(1))

    // SQL surface
    graft.sql.GraftSql.register(spark)
    val viaSql = spark.sql(s"SELECT * FROM iceberg_row_count('$table')").head()
    assert(viaSql.getLong(0) === 30 && viaSql.getBoolean(1))
  }

  test("initial-defaults fill name-mapped (migrated) files by footer presence") {
    // foreign files carry NO field ids — the name-mapped read strips id
    // metadata but must KEEP the EXISTS_DEFAULT marker (r18), so files
    // missing a later-added column by NAME read the initial-default
    val source = tmp("graft_mig_def_")
    writeForeign(src(30), source)
    val table = tmp("graft_mig_deft_") + "/t"
    IcebergWriter.addFiles(spark, table, source, formatVersion = 3)
    IcebergWriter.addColumn(spark, table, "tier",
      org.apache.spark.sql.types.StringType,
      initialDefault = Some("legacy"), writeDefault = Some("standard"))
    val s = IcebergScan.scan(spark, table)
    assert(s.filter(col("tier") === "legacy").count() === 30)
    // an appended file STORES its values (including nulls) — they win
    import spark.implicits._
    IcebergWriter.write(
      Seq((100L, "name-100", 1.0, "stored"), (101L, "name-101", 2.0, null))
        .toDF("id", "name", "score", "tier"), table)
    val s2 = IcebergScan.scan(spark, table)
    assert(s2.filter(col("tier") === "legacy").count() === 30)
    assert(s2.filter(col("tier") === "stored").count() === 1)
    assert(s2.filter(col("tier").isNull).count() === 1)
  }

  test("rowCount under live deletes: position deletes count from delete " +
      "files (r19); may-match equality deletes fall back to the MoR scan") {
    val source = tmp("graft_mig_src10_")
    writeForeign(src(20), source)
    val table = tmp("graft_mig_tbl10_") + "/t"
    IcebergWriter.addFiles(spark, table, source)
    IcebergWriter.delete(spark, table, col("id") <= 5L)

    // v2 position deletes (r19): exact count from the delete files'
    // distinct tombstones — metadata-only, zero data I/O
    val got = IcebergScan.rowCount(spark, table).head()
    assert(got.getLong(0) === 15)
    assert(got.getBoolean(1),
      "position-delete tombstones must serve the metadata count (r19)")

    // an equality delete whose key bounds overlap live files keeps the
    // count unknowable from stats: exact via the MoR scan
    import spark.implicits._
    IcebergWriter.deleteEquality(spark, table, Seq(9L).toDF("id"))
    val eq = IcebergScan.rowCount(spark, table).head()
    assert(eq.getLong(0) === 14)
    assert(!eq.getBoolean(1),
      "a may-match equality delete must disable the metadata path")
  }

  test("addFiles migrates an ORC lake in place — stats pruning included") {
    val source = tmp("graft_mig_orc_")
    import spark.implicits._
    val parts = Seq((1, 50), (51, 100))
    parts.zipWithIndex.foreach { case ((lo, hi), i) =>
      (lo to hi).map(v => (v.toLong, s"n$v")).toDF("id", "name")
        .coalesce(1).write.mode("overwrite").orc(s"$source/part$i")
    }
    val table = tmp("graft_mig_orct_") + "/t"
    IcebergWriter.addFiles(spark, table, source, dataFormat = "orc")

    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 100)
    assert(got.agg(sum("id")).head().getLong(0) === (1L to 100L).sum)
    // ORC footer stats recorded at registration drive bounds pruning
    val pruned = IcebergScan.scan(spark, table, Options(mode = "list_files",
      filters = Seq(ColPredicate("id", Gt, 60L))))
      .filter(col("type") === "data").count()
    assert(pruned === 1, s"expected 1 ORC file after pruning, got $pruned")
    // appends (parquet by default) compose into a mixed-format table
    IcebergWriter.write(Seq((999L, "new")).toDF("id", "name"), table)
    assert(IcebergScan.scan(spark, table).count() === 101)
  }

  test("cloneTable: zero-copy fork, copy-on-write divergence, id-preserving renames") {
    val srcTable = tmp("graft_cl_src_") + "/t"
    import spark.implicits._
    val data = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    IcebergWriter.write(data, srcTable)
    IcebergWriter.delete(spark, srcTable, col("id") > 45L) // live MoR deletes

    val clone = tmp("graft_cl_dst_") + "/t"
    IcebergWriter.cloneTable(spark, srcTable, clone)

    // the clone reads the source's exact MoR state, zero copy
    assert(IcebergScan.scan(spark, clone).count() === 45)
    val files = IcebergScan.scan(spark, clone, Options(mode = "list_files"))
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(srcTable)))

    // copy-on-write: commits on the clone never touch the source
    IcebergWriter.write(Seq((100L, "new")).toDF("id", "v"), clone)
    IcebergWriter.delete(spark, clone, col("id") === 1L)
    assert(IcebergScan.scan(spark, clone).count() === 45)
    assert(IcebergScan.scan(spark, srcTable).count() === 45)
    assert(IcebergScan.scan(spark, srcTable).filter(col("id") === 1L).count() === 1)

    // field ids carried verbatim: a metadata-only rename on the clone
    // still resolves the SOURCE's data files by id
    IcebergWriter.renameColumns(spark, clone, Map("v" -> "label"))
    val renamed = IcebergScan.scan(spark, clone)
    assert(renamed.filter(col("id") === 2L).head().getAs[String]("label") === "v2")

    // clone-side vacuum scans only the clone's dirs — source files survive
    IcebergWriter.removeOrphanFiles(spark, clone, Long.MaxValue)
    assert(IcebergScan.scan(spark, srcTable).count() === 45)
    // the clone's own history starts at the fork: 1 (forked current)
    // + its append + its delete — the source's pre-fork history is gone
    assert(IcebergScan.snapshots(spark, clone).count() === 3)
  }

  test("addColumn after migration: new column null on foreign files, real on appends") {
    val source = tmp("graft_mig_src8_")
    writeForeign(src(10), source)
    val table = tmp("graft_mig_tbl8_") + "/t"
    IcebergWriter.addFiles(spark, table, source)
    IcebergWriter.addColumn(spark, table, "tag",
      org.apache.spark.sql.types.StringType)

    import spark.implicits._
    IcebergWriter.write(
      Seq((99L, "x", 0.0, "tagged")).toDF("id", "name", "score", "tag"), table)
    val got = IcebergScan.scan(spark, table)
    assert(got.count() === 11)
    assert(got.filter(col("tag").isNotNull).count() === 1)
    assert(got.filter(col("id") === 99L).head().getAs[String]("tag") === "tagged")
  }
}
