package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch
import graft.iceberg.{IcebergScan, IcebergWriter}

/** Table statistics (Iceberg spec "Table statistics"): the KMV theta
  * sketch, `analyze`'s statistics commit, lifecycle under appends /
  * re-analyze / expiry, and the NDV-driven broadcast hint. */
class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-stats")
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  // ---- sketch unit properties ----------------------------------------

  test("sketch is exact below k and within 5% at 20x capacity") {
    val rnd = new Random(7)
    val small = new KmvSketch(2048)
    val smallHashes = Seq.fill(1000)(rnd.nextLong()).distinct
    // duplicates must not change the estimate
    (smallHashes ++ smallHashes).foreach(small.update)
    assert(small.estimate === smallHashes.size.toLong)

    val big = new KmvSketch(2048)
    val n = 40000
    val bigHashes = Seq.fill(n)(rnd.nextLong()).distinct
    bigHashes.foreach(big.update)
    val est = big.estimate.toDouble
    assert(math.abs(est - bigHashes.size) / bigHashes.size < 0.05,
      s"estimate $est vs exact ${bigHashes.size}")
  }

  test("sketch merge equals single-pass; serialization round-trips") {
    val rnd = new Random(11)
    val all = Seq.fill(30000)(rnd.nextLong()).distinct
    val single = new KmvSketch(512)
    all.foreach(single.update)
    val parts = all.grouped(7000).map { chunk =>
      val s = new KmvSketch(512); chunk.foreach(s.update); s
    }.toSeq
    val merged = parts.reduce(_ merge _)
    // KMV union is order-independent: merged k-smallest set == single-pass
    assert(merged.serialize().sameElements(single.serialize()))
    val back = KmvSketch.deserialize(single.serialize())
    assert(back.estimate === single.estimate)
  }

  // ---- analyze lifecycle ---------------------------------------------

  test("analyze records NDV statistics; appends carry them; re-analyze replaces") {
    val table = newTable("graft_stats1_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders, table)
    val ndv = IcebergWriter.analyze(spark, table, Seq("o_orderkey", "o_orderstatus"))
    val exactKeys = orders.select("o_orderkey").distinct.count()
    assert(math.abs(ndv("o_orderkey").toDouble - exactKeys) / exactKeys < 0.05)
    assert(ndv("o_orderstatus") === 3L) // exact below k

    val stats = IcebergScan.tableStatistics(spark, table)
    assert(stats.count() === 2)
    val row = stats.filter(col("column_name") === "o_orderkey").head()
    assert(row.getAs[Long]("ndv") === ndv("o_orderkey"))
    assert(row.getAs[String]("blob_type") === "graft-theta-v1")

    // an append commit rebuilds the metadata root — stats must survive
    IcebergWriter.write(orders.limit(10), table)
    assert(IcebergScan.tableStatistics(spark, table).count() === 2)

    // re-analyzing the new head ADDS an entry (different snapshot);
    // re-analyzing the same head again REPLACES, never accumulates
    IcebergWriter.analyze(spark, table, Seq("o_orderkey"))
    IcebergWriter.analyze(spark, table, Seq("o_orderkey", "o_custkey"))
    val after = IcebergScan.tableStatistics(spark, table)
    assert(after.select("snapshot_id").distinct.count() === 2)
    assert(after.filter(col("column_name") === "o_custkey").count() === 1)
  }

  test("expire prunes stats entries; superseded stats files are orphans") {
    val table = newTable("graft_stats2_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders.limit(100), table)
    IcebergWriter.analyze(spark, table, Seq("o_orderkey"))
    IcebergWriter.write(orders.limit(50), table)
    IcebergWriter.analyze(spark, table, Seq("o_orderkey"))
    assert(IcebergScan.tableStatistics(spark, table)
      .select("snapshot_id").distinct.count() === 2)
    // expire the first snapshot: its stats entry goes with it, and the
    // now-unreferenced puffin surfaces as an orphan
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    assert(IcebergScan.tableStatistics(spark, table)
      .select("snapshot_id").distinct.count() === 1)
    val orphans = IcebergWriter.listOrphanFiles(spark, table)
      .collect().map(_.getString(0))
    assert(orphans.exists(p => p.contains("/metadata/stats-") && p.endsWith(".puffin")))
    // re-analyze same head twice: the superseded file is orphaned too
    IcebergWriter.analyze(spark, table, Seq("o_orderkey"))
    val orphans2 = IcebergWriter.listOrphanFiles(spark, table)
      .collect().map(_.getString(0)).count(_.contains("/metadata/stats-"))
    assert(orphans2 === 2)
  }

  test("sql TVF iceberg_table_statistics") {
    graft.sql.GraftSql.register(spark)
    val table = newTable("graft_stats3_")
    IcebergWriter.write(Tables.load(spark, Sf, "nation"), table)
    IcebergWriter.analyze(spark, table)
    val df = spark.sql(s"SELECT column_name, ndv FROM iceberg_table_statistics('$table')")
    // nation: 3 columns, all tiny → exact NDV
    assert(df.count() === 3)
    val exact = Tables.load(spark, Sf, "nation")
      .select("n_nationkey").distinct.count()
    assert(df.filter(col("column_name") === "n_nationkey").head().getLong(1) === exact)
  }

  // ---- partitions metadata table & partition statistics --------------

  test("partitions aggregates per tuple and reflects MoR deletes") {
    val table = newTable("graft_pstats1_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders, table)
    val p0 = IcebergScan.partitions(spark, table).collect()
    assert(p0.length === 1) // unpartitioned: one empty tuple
    assert(p0.head.getAs[Map[String, String]]("partition").isEmpty)
    assert(p0.head.getAs[Long]("data_record_count") === orders.count())
    assert(p0.head.getAs[Long]("total_data_file_size_in_bytes") > 0L)
    val key = orders.select("o_orderkey").head().getLong(0)
    IcebergWriter.delete(spark, table, col("o_orderkey") === key)
    val p1 = IcebergScan.partitions(spark, table).collect()
    assert(p1.map(_.getAs[Long]("position_delete_file_count")).sum === 1L)
    assert(p1.map(_.getAs[Long]("position_delete_record_count")).sum === 1L)
  }

  test("computePartitionStats registers, survives appends, prunes on expire") {
    graft.sql.GraftSql.register(spark)
    val table = newTable("graft_pstats2_")
    val events = Tables.events(spark, Sf)
      .withColumn("dt", to_date(col("ts")))
      .repartition(4, col("dt"))
    IcebergWriter.write(events, table, partitionBy = Seq("dt" -> "day"))
    val statsFile = IcebergWriter.computePartitionStats(spark, table)
    // the written file holds exactly the partitions table + snapshot id
    val stored = spark.read.parquet(statsFile)
    assert(stored.count() === IcebergScan.partitions(spark, table).count())
    assert(stored.columns.contains("last_updated_snapshot_id"))
    // SQL TVF agrees with the source row counts per day
    val viaSql = spark.sql(
      s"SELECT sum(data_record_count) FROM iceberg_partitions('$table')")
      .head().getLong(0)
    assert(viaSql === events.count())
    // entry survives a metadata-rebuilding commit
    IcebergWriter.write(events.limit(5), table)
    assert(IcebergScan.loadInfo(spark, table).partitionStatistics.size === 1)
    // recompute on the new head adds; expiring old snapshots prunes and
    // orphans the superseded file's contents
    IcebergWriter.computePartitionStats(spark, table)
    assert(IcebergScan.loadInfo(spark, table).partitionStatistics.size === 2)
    IcebergWriter.expireSnapshots(spark, table, keep = 1)
    assert(IcebergScan.loadInfo(spark, table).partitionStatistics.size === 1)
    val orphans = IcebergWriter.listOrphanFiles(spark, table)
      .collect().map(_.getString(0))
    assert(orphans.exists(_.contains("/partition-stats-")))
  }

  // ---- NDV-driven broadcast costing ----------------------------------

  test("equality filter on an analyzed column earns a broadcast hint") {
    val table = newTable("graft_stats4_")
    val orders = Tables.load(spark, Sf, "orders")
    IcebergWriter.write(orders, table)
    val key = orders.select("o_orderkey").head().getLong(0)
    val other = orders.select(col("o_orderkey"), col("o_custkey").as("ck"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // below the raw table's size-only estimate, above rows/ndv × width
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
      def joinPlan(): String = {
        val f = IcebergScan.scanFiltered(spark, table, col("o_orderkey") === key)
        other.join(f, "o_orderkey").queryExecution.executedPlan.toString
      }
      // without stats: size-only estimation keeps the full relation size
      assert(!joinPlan().contains("BroadcastHashJoin"))
      IcebergWriter.analyze(spark, table, Seq("o_orderkey"))
      // with NDV: est rows = total/ndv ≈ 1 → hinted broadcast
      assert(joinPlan().contains("BroadcastHashJoin"))
      // and the result is still correct
      val f = IcebergScan.scanFiltered(spark, table, col("o_orderkey") === key)
      assert(other.join(f, "o_orderkey").count() ===
        orders.filter(col("o_orderkey") === key).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
