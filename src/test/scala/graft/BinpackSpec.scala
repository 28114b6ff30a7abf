package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergScan.Options
import graft.iceberg.{IcebergScan, IcebergWriter}

/** Binpack small-file compaction (`rewriteDataFiles`): candidate
  * selection from manifest sizes alone, delete application during the
  * rewrite, EXISTING carry of healthy files with original sequence
  * numbers, time-travel/changelog integrity, and v3 lineage stability. */
class BinpackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-binpack")
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def dataFiles(table: String): Seq[String] =
    IcebergScan.scan(spark, table, Options(mode = "list_files"))
      .filter(col("type") === "data")
      .collect().map(_.getString(0)).toSeq

  test("small files binpack into fewer files with identical rows") {
    val table = newTable("graft_bp1_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders.repartition(8), table)
    val before = dataFiles(table)
    assert(before.size === 8)
    val snap = IcebergWriter.rewriteDataFiles(spark, table)
    assert(snap.nonEmpty)
    val after = dataFiles(table)
    assert(after.size < before.size)
    assert(after.toSet.intersect(before.toSet).isEmpty, "all small files rewritten")
    val back = IcebergScan.scan(spark, table)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).count() === 0L)
    assert(orders.exceptAll(back).count() === 0L)
  }

  test("files above the threshold carry as EXISTING, untouched") {
    val table = newTable("graft_bp2_")
    val lineitem = Tables.load(spark, Sf, "lineitem")
    // one big file, then several tiny appends (a streaming-sink tail)
    IcebergWriter.write(lineitem.coalesce(1), table)
    val big = dataFiles(table)
    assert(big.size === 1)
    (1 to 3).foreach(i =>
      IcebergWriter.write(lineitem.limit(10 * i).coalesce(1), table))
    assert(dataFiles(table).size === 4)
    val conf = spark.sessionState.newHadoopConf()
    val bigSize = {
      val p = new org.apache.hadoop.fs.Path(big.head)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }
    val expect = IcebergScan.scan(spark, table).cache()
    val n = expect.count()
    IcebergWriter.rewriteDataFiles(spark, table, smallFileThreshold = bigSize)
    val after = dataFiles(table)
    assert(after.contains(big.head), "the big file must carry untouched")
    assert(after.size === 2, "three tiny files -> one")
    val back = IcebergScan.scan(spark, table)
    assert(back.count() === n)
    assert(back.exceptAll(expect).count() === 0L)
    // the commit's summary records what the rewrite touched
    assert(IcebergWriter.maxSummaryValue(
      spark, table, "deleted-data-files") === Some(3L))
    assert(IcebergWriter.maxSummaryValue(
      spark, table, "rewritten-bytes").exists(_ > 0L))
  }

  test("deletes apply during the rewrite and stay applied") {
    val table = newTable("graft_bp3_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders.repartition(6), table)
    val victims = orders.select("o_orderkey").limit(20)
      .collect().map(_.getLong(0)).toSet
    IcebergWriter.delete(spark, table, col("o_orderkey").isin(victims.toSeq: _*))
    val beforeRows = IcebergScan.scan(spark, table).count()
    IcebergWriter.rewriteDataFiles(spark, table)
    val back = IcebergScan.scan(spark, table)
    assert(back.count() === beforeRows)
    assert(back.filter(col("o_orderkey").isin(victims.toSeq: _*)).count() === 0L)
    // rewritten files must not resurrect the rows under time travel either
    val snaps = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect().map(_.getLong(1))
    val preDelete = IcebergScan.scan(spark, table, Options(snapshotId = Some(snaps.head)))
    assert(preDelete.count() === orders.count())
  }

  test("rewrite is changelog-invisible (pure compaction window)") {
    val table = newTable("graft_bp4_")
    val nation = Tables.load(spark, Sf, "nation")
    IcebergWriter.write(nation.repartition(4), table)
    val from = IcebergScan.snapshots(spark, table).collect().head.getLong(1)
    IcebergWriter.rewriteDataFiles(spark, table)
    val to = IcebergScan.snapshots(spark, table)
      .orderBy(col("sequence_number").desc).collect().head.getLong(1)
    assert(to !== from)
    val changes = IcebergScan.changelog(spark, table, from, Some(to))
    assert(changes.count() === 0L, "identical rows rewritten = no net change")
  }

  test("no candidates -> no commit; unknown sizes are not small") {
    val table = newTable("graft_bp5_")
    IcebergWriter.write(Tables.load(spark, Sf, "nation"), table)
    assert(IcebergWriter.rewriteDataFiles(
      spark, table, smallFileThreshold = 1L).isEmpty)
    val versionsBefore = IcebergScan.snapshots(spark, table).count()
    assert(versionsBefore === 1L)
  }

  test("v3 row ids survive binpack like a full compaction") {
    val table = newTable("graft_bp6_")
    val orders = Tables.load(spark, Sf, "orders").limit(100)
    IcebergWriter.write(orders.repartition(5), table, formatVersion = 3)
    val before = IcebergScan.scan(spark, table, Options(rowLineage = true))
      .select(col("o_orderkey"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    IcebergWriter.rewriteDataFiles(spark, table)
    val after = IcebergScan.scan(spark, table, Options(rowLineage = true))
      .select(col("o_orderkey"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before, "row ids must be stable across the rewrite")
  }
}
