package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `graft_dsum` ([[graft.functions.DecimalSum128]]) must be VALUE-identical
  * to the built-in `sum(decimal(18,6))` it replaced in the query registry
  * (round 19): same exact sums, same null-on-empty/all-null semantics,
  * across partial-aggregation merges and group-by shapes. The driver
  * hash-compares every declared query against its DuckDB oracle, so any
  * drift here is a correctness regression, not a perf detail. */
class DecimalSum128Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[8]", "8").appName("graft-dsum").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def dsumNew(c: org.apache.spark.sql.Column) =
    call_function("graft_dsum", c.cast(DecimalType(18, 6)))
  private def dsumOld(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6)))

  test("value-identical to sum(decimal(18,6)) on random signed data with nulls") {
    import spark.implicits._
    val r = new scala.util.Random(42)
    // magnitudes spanning tiny fractions to near the 12-integer-digit cap,
    // both signs, ~10% nulls; 8 groups force the merge path across 8
    // partitions (partial -> final)
    val rows = (1 to 20000).map { i =>
      val v: java.lang.Double =
        if (r.nextInt(10) == 0) null
        else (r.nextDouble() - 0.5) * math.pow(10, r.nextInt(12))
      (i % 8, v)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(dsumNew(col("v")).cast("string").as("s"))
      .orderBy("g").collect().map(_.getString(1)).toSeq
    val want = df.groupBy("g")
      .agg(dsumOld(col("v")).cast("string").as("s"))
      .orderBy("g").collect().map(_.getString(1)).toSeq
    // compare as BigDecimal values: the declared precision differs
    // (38 vs 28) but every surfaced use rounds/casts first
    assert(got.map(BigDecimal(_)) == want.map(BigDecimal(_)))
  }

  test("empty group and all-null group yield NULL, like the built-in") {
    import spark.implicits._
    val df = Seq((0, null: java.lang.Double), (0, null: java.lang.Double))
      .toDF("g", "v")
    val row = df.groupBy("g").agg(dsumNew(col("v")).as("s")).collect().head
    assert(row.isNullAt(1))
    val empty = df.filter(col("g") === 99)
      .agg(dsumNew(col("v")).as("s")).collect().head
    assert(empty.isNullAt(0))
  }

  test("128-bit carry path: sums crossing the 64-bit unscaled boundary") {
    import spark.implicits._
    // 40k rows of ±987,654,321,098.765625 (binary-exact double near the
    // decimal(18,6) integer-digit cap): the running unscaled sum
    // repeatedly crosses ±2^63 (9.2e18) where a plain long accumulator
    // would wrap — alternating signs also walk the sum back through zero
    // so both carry directions are exercised
    val big = 987654321098.765625
    val rows = (1 to 40000).map { i =>
      (0, if (i % 3 == 0) -big else big)
    }
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.agg(dsumNew(col("v")).cast("string")).collect().head.getString(0)
    val want = df.agg(dsumOld(col("v")).cast("string")).collect().head.getString(0)
    assert(BigDecimal(got) == BigDecimal(want))
    // and a genuinely-beyond-2^63 unscaled total (positive only): the
    // built-in still fits decimal(28,6), so both must agree exactly
    val pos = (1 to 40000).map(_ => (0, big)).toDF("g", "v").repartition(16)
    val gotPos = pos.agg(dsumNew(col("v")).cast("string")).collect().head.getString(0)
    val wantPos = pos.agg(dsumOld(col("v")).cast("string")).collect().head.getString(0)
    assert(BigDecimal(gotPos) == BigDecimal(wantPos))
    assert(BigDecimal(gotPos) > BigDecimal("9223372036854775807") / 1000000)
  }

  test("rounded-double output shape matches the dsumOut contract") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val got = li.groupBy("l_returnflag")
      .agg(round(dsumNew(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .cast("double").as("s"))
      .orderBy("l_returnflag").collect().map(_.getDouble(1)).toSeq
    val want = li.groupBy("l_returnflag")
      .agg(round(dsumOld(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .cast("double").as("s"))
      .orderBy("l_returnflag").collect().map(_.getDouble(1)).toSeq
    assert(got == want)
  }
}
