package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** Commit logs (Iceberg spec "Snapshot Log" / "Metadata Log") and the
  * `history` metadata table rendered from them: append/rollback/expire
  * lifecycle, staged-branch invisibility, metadata-log bounding, and
  * the foreign-table (no logs) degradation. */
class HistorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-history")
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def logIds(table: String): Seq[Long] =
    IcebergScan.loadInfo(spark, table).snapshotLog.map(_._2)

  private def metadataLog(table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val json = graft.iceberg.IcebergIO.readString(currentMetadataFile(table), conf)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    Option(root.get("metadata-log")).toSeq
      .flatMap(_.elements().asScala)
      .map(_.get("metadata-file").asText)
  }

  private def currentMetadataFile(table: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val hint = graft.iceberg.IcebergIO.readString(
      new org.apache.hadoop.fs.Path(table, "metadata/version-hint.text").toString,
      conf).trim
    new org.apache.hadoop.fs.Path(table, s"metadata/v$hint.metadata.json").toString
  }

  test("appends extend the snapshot log; timestamps are monotone") {
    val table = newTable("graft_hist1_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.write(nation.limit(2), table)
    IcebergWriter.write(nation.limit(1), table)
    val info = IcebergScan.loadInfo(spark, table)
    assert(info.snapshotLog.map(_._2) === Seq(1L, 2L, 3L))
    assert(info.snapshotLog.map(_._1) === info.snapshotLog.map(_._1).sorted)
    val h = IcebergScan.history(spark, table).orderBy("made_current_at").collect()
    assert(h.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(h.map(r => Option(r.get(2))).toSeq ===
      Seq(None, Some(1L), Some(2L)))
    assert(h.forall(_.getBoolean(3)))
  }

  test("rollback prunes dropped entries and re-records the target") {
    val table = newTable("graft_hist2_")
    val nation = Tables.load(spark, Sf, "nation")
    val snap1 = IcebergWriter.write(nation, table)
    IcebergWriter.write(nation.limit(2), table)
    IcebergWriter.rollback(spark, table, snap1)
    assert(logIds(table) === Seq(1L, 1L))
    val h = IcebergScan.history(spark, table).collect()
    assert(h.length === 2)
    assert(h.forall(r => r.getLong(1) == 1L && r.getBoolean(3)))
  }

  test("expire removes expired snapshots' log entries only") {
    val table = newTable("graft_hist3_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.write(nation.limit(2), table)
    IcebergWriter.write(nation.limit(1), table)
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    assert(logIds(table) === Seq(3L))
    val h = IcebergScan.history(spark, table).collect()
    assert(h.map(_.getLong(1)).toSeq === Seq(3L))
    // parent 2 was expired, but the surviving node still records the link
    assert(h.head.getLong(2) === 2L)
  }

  test("staged branch commits stay out of the log until fast-forward") {
    val table = newTable("graft_hist4_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.createBranch(spark, table, "audit")
    IcebergWriter.write(nation.limit(3), table, branch = "audit")
    assert(logIds(table) === Seq(1L), "staged commit must not enter the log")
    IcebergWriter.fastForward(spark, table, source = "audit", branch = "main")
    assert(logIds(table) === Seq(1L, 2L), "publish makes the head current")
    val h = IcebergScan.history(spark, table).orderBy("made_current_at").collect()
    assert(h.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(h.forall(_.getBoolean(3)))
  }

  test("metadata log references every superseded version, bounded") {
    val table = newTable("graft_hist5_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    IcebergWriter.write(nation.limit(2), table)
    IcebergWriter.renameColumns(spark, table, Map("n_name" -> "name"))
    val files = metadataLog(table)
    // three commits → v1 and v2 superseded (schema commit supersedes v2→v3)
    assert(files.map(_.split("/").last) ===
      Seq("v1.metadata.json", "v2.metadata.json"))
    val conf = spark.sessionState.newHadoopConf()
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      assert(p.getFileSystem(conf).exists(p), s"logged file missing: $f")
    }
  }

  test("SQL TVF renders history; foreign tables without logs yield 0 rows") {
    graft.sql.GraftSql.register(spark)
    val table = newTable("graft_hist6_")
    IcebergWriter.write(Tables.load(spark, Sf, "nation"), table)
    val viaSql = spark.sql(s"SELECT snapshot_id FROM iceberg_history('$table')")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === Seq(1L))
    // the reference's v1 fixture predates our writer — no snapshot-log
    val foreign = "/root/reference/test/data/iceberg/generated_spec1_0_001/pyspark_iceberg_table"
    if (new java.io.File(foreign).exists) {
      assert(IcebergScan.history(spark, foreign).count() === 0L)
    }
  }

  test("metadata_log_entries lists superseded files plus current, latest_* resolved") {
    val table = newTable("graft_hist7_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation, table)
    Thread.sleep(2)
    IcebergWriter.write(nation.limit(2), table)
    Thread.sleep(2)
    IcebergWriter.createTag(spark, table, "t1", Some(2L)) // metadata-only
    val rows = IcebergScan.metadataLog(spark, table)
      .orderBy("file").collect()
    assert(rows.map(_.getString(1).split("/").last).toSeq ===
      Seq("v1.metadata.json", "v2.metadata.json", "v3.metadata.json"))
    // v1 was current when snapshot 1 led; v2 and the tag commit → snapshot 2
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 2L, 2L))
    assert(rows.map(_.getLong(4)).toSeq === Seq(1L, 2L, 2L))
    // timestamps monotone non-decreasing in log order
    val ts = IcebergScan.metadataLog(spark, table)
      .collect().map(_.getAs[java.time.LocalDateTime](0))
    assert(ts.toSeq === ts.sortBy(t => t.toEpochSecond(java.time.ZoneOffset.UTC) -> t.getNano).toSeq)
    // SQL TVF surface
    graft.sql.GraftSql.register(spark)
    val n = spark.sql(
      s"SELECT count(*) FROM iceberg_metadata_log_entries('$table')")
      .collect()(0).getLong(0)
    assert(n === 3L)
    // foreign (reference-written) table: its one superseded entry plus the
    // current file; the current row's latest_* resolve via
    // current-snapshot-id
    val foreign2 = "/root/reference/data/iceberg/lineitem_iceberg"
    val f = IcebergScan.metadataLog(spark, foreign2,
      IcebergScan.Options(allowMovedPaths = true)).collect()
    assert(f.length === 2)
    assert(f(0).getString(1).endsWith("v1.metadata.json"))
    assert(f(1).getString(1).endsWith("v2.metadata.json"))
    assert(f(1).getLong(2) === 7635660646343998149L)
  }
}
