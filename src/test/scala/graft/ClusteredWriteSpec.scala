package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergScan

/** Clustered hash-mode writes (round 12): with
  * `write.distribution-mode=hash` a wide append lands ~one file per
  * partition instead of tasks x partitions. Division of labor (measured):
  * STREAMING epochs get the repartition from the PLANNER — the V2 Write
  * declares a clustered distribution over the table's partition
  * Transforms, resolved through the catalog's FunctionCatalog, and
  * V2Writes applies it to WriteToMicroBatchDataSource; the BATCH V1
  * path ignores required distributions, so there the writer's own hash
  * repartition does the clustering. Same observable layout either way. */
class ClusteredWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft_clustered_wh_").toString

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .appName("graft-clustered-write")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def dataFiles(table: String): Long =
    IcebergScan.scan(spark, s"$wh/db/$table",
      IcebergScan.Options(mode = "list_files"))
      .filter(col("type") === "data").count()

  test("batch INSERT clusters by bucket transform through the planner") {
    spark.sql(
      """CREATE TABLE graft.db.clustered_b (id BIGINT, v DOUBLE)
        |PARTITIONED BY (bucket(4, id))
        |TBLPROPERTIES ('write.distribution-mode' = 'hash')""".stripMargin)
    // 4 input partitions x 4 buckets = 16 files without clustering
    spark.sql(
      """INSERT INTO graft.db.clustered_b
        |SELECT /*+ REPARTITION(4) */ id, CAST(id AS DOUBLE)
        |FROM range(0, 4000)""".stripMargin)
    // batch hash-mode clusters via the WRITER's own repartition (the V1
    // batch path ignores requiredDistribution — measured; see
    // GraftWriteBuilder.plannerClusters)
    val files = dataFiles("clustered_b")
    assert(files === 4L,
      s"hash-mode bucket write must land one file per bucket, got $files")
    assert(spark.sql("SELECT count(*) FROM graft.db.clustered_b")
      .head.getLong(0) === 4000L)
    // rows land in their declared buckets: the transform FUNCTION agrees
    // with the files' partition tuples (prune one bucket = 1 file)
    val one = IcebergScan.scanFiltered(
      spark, s"$wh/db/clustered_b",
      expr("graft.system.bucket(4, id)") === 2,
      IcebergScan.Options(mode = "list_files"))
    assert(one.filter(col("type") === "data").count() <= 4L)
  }

  test("batch INSERT clusters by days transform through the planner") {
    spark.sql(
      """CREATE TABLE graft.db.clustered_d (ts TIMESTAMP_NTZ, v BIGINT)
        |PARTITIONED BY (days(ts))
        |TBLPROPERTIES ('write.distribution-mode' = 'hash')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.db.clustered_d
        |SELECT /*+ REPARTITION(4) */
        |  timestampadd(HOUR, CAST(id % 72 AS INT), TIMESTAMP_NTZ '2024-01-01 00:00:00'),
        |  id
        |FROM range(0, 2000)""".stripMargin)
    val files = dataFiles("clustered_d")
    assert(files === 3L, s"3 days -> 3 files under planner clustering, got $files")
  }

  test("streaming epochs cluster by the partition transform too") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sql(
      """CREATE TABLE graft.db.clustered_s (id BIGINT, v DOUBLE)
        |PARTITIONED BY (bucket(4, id))
        |TBLPROPERTIES ('write.distribution-mode' = 'hash')""".stripMargin)
    val in = MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val q = in.toDF().toDF("id", "v")
      .repartition(4) // would be 4 tasks x 4 buckets = 16 files unclustered
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.db.clustered_s")
    try {
      in.addData((0L until 400L).map(i => (i, i.toDouble)): _*)
      q.processAllAvailable()
      val files = dataFiles("clustered_s")
      assert(files === 4L,
        s"one epoch over 4 buckets must land 4 files, got $files")
    } finally q.stop()
  }

  test("distribution-mode none keeps the shuffle-free write") {
    spark.sql(
      """CREATE TABLE graft.db.unclustered (id BIGINT, v DOUBLE)
        |PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      """INSERT INTO graft.db.unclustered
        |SELECT /*+ REPARTITION(4) */ id, CAST(id AS DOUBLE)
        |FROM range(0, 4000)""".stripMargin)
    val files = dataFiles("unclustered")
    assert(files > 4L, s"default mode writes per-task files, got $files")
    assert(spark.sql("SELECT count(*) FROM graft.db.unclustered")
      .head.getLong(0) === 4000L)
  }
}
