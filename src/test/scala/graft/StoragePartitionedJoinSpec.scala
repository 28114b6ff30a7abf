package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (VERDICT r12 #2): two graft tables bucketed
  * by the same key join with ZERO Exchange — the scans report
  * `KeyGroupedPartitioning` over the catalog-bound bucket function, and
  * Spark zips equal tuples instead of shuffling 100 TB twice. */
class StoragePartitionedJoinSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private val Sf = "/root/testdata/sf0.001"
  private val wh = Files.createTempDirectory("graft_spj_wh_").toString

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      // Spark's SPJ opt-ins: the feature flag plus push-down of partition
      // values so a tuple present on one side only still joins correctly
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // force a non-broadcast join so the Exchange pin is meaningful
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .appName("graft-spj")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.size
  }

  test("co-bucketed graft tables join with zero Exchange, correct result") {
    spark.sql(
      "CREATE TABLE graft.db.spj_orders (o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "PARTITIONED BY (bucket(4, o_orderkey))")
    spark.sql(
      "CREATE TABLE graft.db.spj_items (o_orderkey BIGINT, qty BIGINT) " +
        "PARTITIONED BY (bucket(4, o_orderkey))")
    val orders = Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("double"))
      .limit(500).cache()
    orders.createOrReplaceTempView("spj_src")
    spark.sql(
      "INSERT INTO graft.db.spj_orders SELECT o_orderkey, o_totalprice FROM spj_src")
    spark.sql(
      "INSERT INTO graft.db.spj_items " +
        "SELECT o_orderkey, o_orderkey % 7 AS qty FROM spj_src WHERE o_orderkey % 2 = 0")

    val joined = spark.sql(
      """SELECT a.o_orderkey, a.o_totalprice, b.qty
        |FROM graft.db.spj_orders a JOIN graft.db.spj_items b
        |  ON a.o_orderkey = b.o_orderkey""".stripMargin)
    val nShuffles = shuffles(joined)
    assert(nShuffles === 0,
      s"expected a storage-partitioned join, got $nShuffles shuffles:\n" +
        joined.queryExecution.executedPlan)

    // same answer as the plain (shuffled) dataframe join
    val want = orders.join(
        orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), (col("o_orderkey") % 7).as("qty")),
        "o_orderkey")
      .agg(count(lit(1)), sum("qty"), round(sum("o_totalprice"), 2))
      .head
    val got = joined.agg(count(lit(1)), sum("qty"), round(sum("o_totalprice"), 2))
      .head
    assert(got === want)
  }

  test("aggregation on the bucket key also skips its Exchange") {
    val agg = spark.sql(
      "SELECT o_orderkey, count(*) AS c FROM graft.db.spj_orders GROUP BY o_orderkey")
    // group-by on a superset of the partition key: KeyGroupedPartitioning
    // satisfies the clustered distribution, no shuffle
    assert(shuffles(agg) === 0, agg.queryExecution.executedPlan.toString)
    assert(agg.agg(sum("c")).head.getLong(0) === 500L)
  }

  test("pushed filters prune tuple groups and reach the parquet reader") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val keys = spark.sql("SELECT o_orderkey FROM graft.db.spj_orders LIMIT 1")
      .collect().map(_.getLong(0))
    val k = keys.head
    val q = spark.sql(s"SELECT * FROM graft.db.spj_orders WHERE o_orderkey = $k")
    q.collect()
    val scans = collect(q.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected the keyed V2 scan")
    // Eq projects through the bucket transform: only the key's bucket
    // survives entry pruning → fewer than the table's 4 tuple groups
    assert(scans.head.inputRDD.getNumPartitions < 4,
      s"expected bucket pruning, got ${scans.head.inputRDD.getNumPartitions} groups")
    assert(q.count() === 1L)
  }

  test("a filter pruning EVERY file plans zero splits, not a full scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // -1 sits below every file's o_orderkey lower bound: entry pruning
    // drops all groups; the scan must plan ZERO input partitions (the V1
    // fallback would rebuild the unfiltered relation = full-table scan)
    val q = spark.sql("SELECT * FROM graft.db.spj_orders WHERE o_orderkey = -1")
    assert(q.count() === 0L)
    val scans = collect(q.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected the keyed/empty V2 scan")
    assert(scans.head.inputRDD.getNumPartitions === 0,
      s"expected zero splits, got ${scans.head.inputRDD.getNumPartitions}")
  }

  test("identity-partitioned tables also join storage-partitioned") {
    // SPJ is not bucket-specific: any catalog-resolvable transform whose
    // tuples match across sides zips — here identity(region) on both
    spark.sql(
      "CREATE TABLE graft.db.spj_id_a (region STRING, v BIGINT) " +
        "PARTITIONED BY (region)")
    spark.sql(
      "CREATE TABLE graft.db.spj_id_b (region STRING, w BIGINT) " +
        "PARTITIONED BY (region)")
    spark.sql(
      "INSERT INTO graft.db.spj_id_a VALUES ('emea', 1), ('apac', 2), ('amer', 3)")
    spark.sql(
      "INSERT INTO graft.db.spj_id_b VALUES ('emea', 10), ('apac', 20), ('apac', 21)")
    val joined = spark.sql(
      """SELECT a.region, a.v, b.w
        |FROM graft.db.spj_id_a a JOIN graft.db.spj_id_b b
        |  ON a.region = b.region""".stripMargin)
    assert(shuffles(joined) === 0,
      joined.queryExecution.executedPlan.toString)
    assert(joined.count() === 3L) // emea x1, apac 1x2
  }

  test("keyed path stays OFF for MoR tables (deletes force the native plan)") {
    spark.sql(
      "CREATE TABLE graft.db.spj_mor (o_orderkey BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(4, o_orderkey))")
    spark.sql(
      "INSERT INTO graft.db.spj_mor SELECT o_orderkey, 1 FROM spj_src")
    spark.sql("DELETE FROM graft.db.spj_mor WHERE o_orderkey % 3 = 0")
    val expected = spark.table("spj_src")
      .filter(col("o_orderkey") % 3 =!= 0).count()
    assert(spark.sql("SELECT * FROM graft.db.spj_mor").count() === expected)
  }
}
