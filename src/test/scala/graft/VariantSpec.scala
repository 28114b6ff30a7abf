package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** Iceberg spec v3 `variant` columns end to end: declared as `variant` in
  * the schema JSON, stored as the Parquet VARIANT logical type (Spark's
  * native VariantType — no JSON round trip on read), v3-gated, MoR- and
  * CDC-compatible, rename-safe via the column's single field id. */
class VariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-variant")
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def sample() = {
    val events = Tables.events(spark, Sf).limit(200).cache()
    events.select(col("event_id"), col("event_type"),
      parse_json(col("props")).as("payload"))
  }

  test("variant column round-trips and declares type 'variant' in metadata") {
    val table = newTable("graft_var1_")
    val src = sample()
    IcebergWriter.write(src, table, formatVersion = 3)
    val back = IcebergScan.scan(spark, table)
    assert(back.schema("payload").dataType ===
      org.apache.spark.sql.types.VariantType)
    // values survive byte-for-byte at the JSON level
    val expect = src.selectExpr("event_id", "to_json(payload) j")
    val got = back.selectExpr("event_id", "to_json(payload) j")
    assert(got.exceptAll(expect).count() === 0L)
    assert(expect.exceptAll(got).count() === 0L)
    // the committed schema declares the spec type, not a struct
    val json = graft.iceberg.IcebergIO.readString(
      new org.apache.hadoop.fs.Path(table, "metadata/v1.metadata.json").toString,
      spark.sessionState.newHadoopConf())
    assert(json.contains("\"variant\""))
  }

  test("variant_get pushes through the scan and aggregates") {
    val table = newTable("graft_var2_")
    IcebergWriter.write(sample(), table, formatVersion = 3)
    val viaVariant = IcebergScan.scan(spark, table)
      .selectExpr("variant_get(payload, '$.k', 'long') k")
      .agg(sum("k")).head().getLong(0)
    val viaJson = Tables.events(spark, Sf).limit(200)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).head().getLong(0)
    assert(viaVariant === viaJson)
  }

  test("a v2 table rejects variant columns with a clear error") {
    val table = newTable("graft_var3_")
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.write(sample(), table) // formatVersion defaults to 2
    }
    assert(e.getMessage.contains("variant requires format-version 3"))
  }

  test("MoR delete and changelog work over a variant table") {
    val table = newTable("graft_var4_")
    val src = sample()
    IcebergWriter.write(src, table, formatVersion = 3)
    val victim = src.select("event_id").head().getLong(0)
    IcebergWriter.delete(spark, table, col("event_id") === victim)
    val back = IcebergScan.scan(spark, table)
    assert(back.count() === src.count() - 1)
    assert(back.filter(col("event_id") === victim).count() === 0L)
    // CDC: the delete shows exactly the victim row, payload intact
    val snaps = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").collect().map(_.getLong(1))
    val changes = IcebergScan.changelog(spark, table, snaps.head, Some(snaps.last))
    val del = changes.filter(col("_change_type") === "delete").collect()
    assert(del.map(_.getAs[Long]("event_id")).toSeq === Seq(victim))
    val wantJson = src.filter(col("event_id") === victim)
      .selectExpr("to_json(payload)").head().getString(0)
    val gotJson = changes.filter(col("_change_type") === "delete")
      .selectExpr("to_json(payload)").head().getString(0)
    assert(gotJson === wantJson)
  }

  test("rename keeps the variant column resolvable by field id") {
    val table = newTable("graft_var5_")
    val src = sample()
    IcebergWriter.write(src, table, formatVersion = 3)
    IcebergWriter.renameColumns(spark, table, Map("payload" -> "doc"))
    val back = IcebergScan.scan(spark, table)
    assert(back.columns.contains("doc") && !back.columns.contains("payload"))
    val n = back.selectExpr("variant_get(doc, '$.k', 'long') k")
      .filter(col("k").isNotNull).count()
    assert(n > 0L)
  }
}
