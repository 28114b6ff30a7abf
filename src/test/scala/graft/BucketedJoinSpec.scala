package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins — the pre-shuffle technique a 100 TB
  * deployment uses for repeated fact⋈fact joins: both tables written
  * bucketed by the join key join WITHOUT any shuffle exchange. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_wh_").toString

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4")
      .appName("graft-buckets")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    Tables.load(spark, sf, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.load(spark, sf, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey"))
    joined.collect() // finalize the AQE plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(2000)}")

    // sanity: same row count as the shuffled join of the raw tables
    val raw = Tables.load(spark, sf, "orders").join(
      Tables.load(spark, sf, "customer"),
      org.apache.spark.sql.functions.col("o_custkey") ===
      org.apache.spark.sql.functions.col("c_custkey"))
    assert(joined.count() === raw.count())
  }
}
