package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}
import graft.iceberg.IcebergScan.Options

/** Spec-v3 ROW LINEAGE: stable `_row_id` / `_last_updated_sequence_number`
  * across appends, MoR deletes/updates, compaction (materialized ids),
  * and v2→v3 upgrade (metadata-only backfill). */
class RowLineageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-rowlineage")
      .getOrCreate()

  // deterministic key-ranked subsets (orders.limit(N) is arbitrary and
  // NOT stable across jobs)
  private lazy val orders = Tables.load(spark, Sf, "orders")
  private lazy val keys: Array[Long] =
    orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
  private def firstN(n: Int) = orders.filter(col("o_orderkey") <= keys(n - 1))
  private def slice(from: Int, until: Int) = orders.filter(
    col("o_orderkey") > keys(from - 1) && col("o_orderkey") <= keys(until - 1))

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def lineage(table: String) =
    IcebergScan.scan(spark, table, Options(rowLineage = true))

  private def ids(table: String): Set[Long] =
    lineage(table).select("_row_id")
      .collect().map(r => r.getLong(0)).toSet

  test("v3 write assigns a dense 0..N-1 id space; seq 1 everywhere") {
    val table = newTable("graft_rl1_")
    IcebergWriter.write(firstN(400).repartition(3), table, formatVersion = 3)
    val got = lineage(table)
      .select("_row_id", "_last_updated_sequence_number").collect()
    assert(got.length === 400)
    assert(got.map(_.getLong(0)).toSet === (0L until 400L).toSet)
    assert(got.map(_.getLong(1)).toSet === Set(1L))
  }

  test("append continues the id space; old rows keep ids and seq") {
    val table = newTable("graft_rl2_")
    IcebergWriter.write(firstN(300), table, formatVersion = 3)
    val before = ids(table)
    IcebergWriter.write(slice(300, 500), table)
    val after = lineage(table)
      .select("_row_id", "_last_updated_sequence_number").collect()
    assert(after.length === 500)
    assert(after.map(_.getLong(0)).toSet === (0L until 500L).toSet)
    // the original 300 still carry seq 1, the new 200 carry seq 2
    assert(after.count(_.getLong(1) == 1L) === 300)
    assert(after.filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet === before)
  }

  test("MoR delete keeps surviving ids; update re-ids only touched rows") {
    val table = newTable("graft_rl3_")
    IcebergWriter.write(firstN(400), table, formatVersion = 3)
    val full = lineage(table).select("o_orderkey", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = keys(99)
    IcebergWriter.delete(spark, table, col("o_orderkey") <= cut)
    val surviving = lineage(table).select("o_orderkey", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(surviving.size === 300)
    // deletion vectors leave data files untouched: every surviving row
    // keeps exactly its pre-delete _row_id
    assert(surviving === full.filter { case (k, _) => k > cut })

    // update re-ids ONLY the rewritten rows, above the old high-water
    val maxBefore = full.values.max
    val upCut = keys(149) // rows 100..149 survive the delete and match
    IcebergWriter.update(spark, table, col("o_orderkey") <= upCut,
      Map("o_orderstatus" -> lit("X")))
    val after = lineage(table).select("o_orderkey", "_row_id", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val (touched, untouched) = after.partition(_._1 <= upCut)
    assert(touched.length === 50 && touched.forall(_._3 == "X"))
    assert(touched.forall(_._2 > maxBefore)) // fresh ids, never reused
    assert(untouched.map(t => t._1 -> t._2).toMap ===
      surviving.filter { case (k, _) => k > upCut })
  }

  test("compaction materializes ids: lineage identical across the rewrite") {
    val table = newTable("graft_rl4_")
    IcebergWriter.write(firstN(400).repartition(4), table, formatVersion = 3)
    IcebergWriter.delete(spark, table, col("o_orderkey") <= keys(99))
    val before = lineage(table)
      .select("o_orderkey", "_row_id", "_last_updated_sequence_number")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    IcebergWriter.compact(spark, table)
    val after = lineage(table)
      .select("o_orderkey", "_row_id", "_last_updated_sequence_number")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before)
    // and a post-compact append still draws ids above the high-water mark
    IcebergWriter.write(slice(400, 450), table)
    val allIds = ids(table)
    assert(allIds.size === 350)
    assert(allIds.count(_ >= 400L) === 50) // the 50 appended rows
  }

  test("v2→v3 upgrade backfills lineage for existing files, metadata-only") {
    val table = newTable("graft_rl5_")
    IcebergWriter.write(firstN(300).repartition(2), table) // v2
    IcebergWriter.delete(spark, table, col("o_orderkey") <= keys(49)) // parquet deletes
    intercept[IllegalArgumentException] { lineage(table).collect() } // v2: no lineage
    IcebergWriter.upgradeFormat(spark, table)
    val got = lineage(table).select("_row_id").collect().map(_.getLong(0))
    // live rows all carry ids; ids are distinct and within the assigned
    // range (deleted positions consume ids too — ranges are per FILE)
    assert(got.length === 250)
    assert(got.toSet.size === 250)
    assert(got.forall(id => id >= 0L && id < 300L))
    // post-upgrade append starts at the backfilled high-water mark
    IcebergWriter.write(slice(300, 320), table)
    assert(ids(table).count(_ >= 300L) === 20)
  }

  test("merge assigns fresh ids to upserted rows only") {
    val table = newTable("graft_rl6_")
    IcebergWriter.write(firstN(200), table, formatVersion = 3)
    val src = firstN(30).withColumn("o_orderstatus", lit("M"))
    IcebergWriter.merge(spark, table, src, Seq("o_orderkey"))
    val after = lineage(table).select("o_orderstatus", "_row_id").collect()
    assert(after.length === 200)
    val (merged, kept) = after.partition(_.getString(0) == "M")
    assert(merged.length === 30)
    assert(merged.forall(_.getLong(1) >= 200L)) // fresh range
    assert(kept.forall(_.getLong(1) < 200L))    // untouched rows keep ids
  }
}
