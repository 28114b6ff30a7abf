package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergScan, IcebergWriter}

/** ORC data files — Iceberg's second data format (engine extension; the
  * reference reads parquet only): ORC-format appends, mixed-format
  * tables, bounds-based pruning from ORC footer statistics, and
  * merge-on-read deletes over ORC files. */
class OrcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-orc").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def idsDF(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id").withColumn("label", concat(lit("row-"), col("id")))
  }

  test("an ORC-format table round-trips through write and scan") {
    val table = tmp("graft_orc_rt_") + "/t"
    IcebergWriter.write(idsDF(1, 2, 3), table, dataFormat = Some("orc"))
    val rows = IcebergScan.scan(spark, table)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "row-1"), (2L, "row-2"), (3L, "row-3")))
    // manifests record the format
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).distinct
    assert(formats.toSeq === Seq("ORC"))
  }

  test("mixed parquet + ORC appends scan as one table") {
    val table = tmp("graft_orc_mixed_") + "/t"
    IcebergWriter.write(idsDF(1, 2), table)                       // parquet
    IcebergWriter.write(idsDF(3), table, dataFormat = Some("orc"))
    IcebergWriter.write(idsDF(4), table)                          // parquet
    assert(IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).sorted.distinct
    assert(formats.toSeq === Seq("ORC", "PARQUET"))
    // incremental windows cross the format boundary too
    val first = IcebergScan.snapshots(spark, table)
      .orderBy("sequence_number").head().getAs[Long]("snapshot_id")
    assert(IcebergScan.incrementalAppend(spark, table, first)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
  }

  test("ORC footer statistics drive file pruning") {
    import spark.implicits._
    val table = tmp("graft_orc_prune_") + "/t"
    IcebergWriter.write((1L to 100L).toDF("id").repartition(1), table,
      dataFormat = Some("orc"))
    IcebergWriter.write((1000L to 1100L).toDF("id").repartition(1), table,
      dataFormat = Some("orc"))
    val kept = IcebergScan.scanFiltered(spark, table, col("id") === 1050L,
      IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()
    assert(kept === 1)
    assert(IcebergScan.scanFiltered(spark, table, col("id") === 1050L)
      .count() === 1)
  }

  test("equality deletes apply over ORC files; position deletes fail loudly") {
    import spark.implicits._
    val table = tmp("graft_orc_mor_") + "/t"
    IcebergWriter.write(idsDF(1L to 10L: _*), table, dataFormat = Some("orc"))
    // positions don't exist for ORC rows (Spark exposes no row_index):
    // the position-delete path must refuse rather than no-op
    val e = intercept[UnsupportedOperationException](
      IcebergWriter.delete(spark, table, col("id") <= 3))
    assert(e.getMessage.contains("equality deletes"))
    // the spec's alternative works: equality deletes key on columns
    IcebergWriter.deleteEquality(spark, table, Seq(1L, 2L, 3L).toDF("id"))
    val rows = IcebergScan.scan(spark, table)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq === (4L to 10L))
  }

  test("ORC footer stats agree with parquet's for identical data") {
    import spark.implicits._
    val rows = Seq(
      (1L, "aardvark-with-a-very-long-name", 1.5),
      (9L, "zebra-with-an-equally-long-name", -2.5))
      .toDF("id", "name", "score").repartition(1)
    val pq = tmp("graft_orc_par_p_") + "/t"
    val orc = tmp("graft_orc_par_o_") + "/t"
    IcebergWriter.write(rows, pq)
    IcebergWriter.write(rows, orc, dataFormat = Some("orc"))
    def bounds(t: String) = IcebergScan.files(spark, t).collect().map { r =>
      (r.getAs[Map[Int, String]]("lower_bounds").toSeq.sorted,
       r.getAs[Map[Int, String]]("upper_bounds").toSeq.sorted,
       r.getAs[Map[Int, Long]]("null_value_counts").toSeq.sorted)
    }.toSeq
    assert(bounds(pq) === bounds(orc))
  }

  test("write.format.default property is honored when no format is passed") {
    val table = tmp("graft_orc_prop_") + "/t"
    IcebergWriter.write(idsDF(1), table, dataFormat = Some("orc"))
    // patch the table property in, as a foreign catalog would
    val conf = spark.sessionState.newHadoopConf()
    val metaDir = new org.apache.hadoop.fs.Path(table, "metadata")
    val fs = metaDir.getFileSystem(conf)
    val v1 = new org.apache.hadoop.fs.Path(metaDir, "v1.metadata.json")
    val txt = new String(
      fs.open(v1).readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    val withProp = txt.replaceFirst("\\{",
      """{"properties":{"write.format.default":"orc"},""")
    val v1b = new org.apache.hadoop.fs.Path(metaDir, "v1.metadata.json")
    fs.delete(v1b, false)
    val out = fs.create(v1b, true)
    out.write(withProp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    IcebergWriter.write(idsDF(2), table) // no dataFormat: property decides
    val formats = IcebergScan.files(spark, table)
      .select("file_format").collect().map(_.getString(0)).distinct
    assert(formats.toSeq === Seq("ORC"))
  }
}
