package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{IcebergTransforms => T}

/** The Iceberg transforms as DSv2 catalog functions (round 12):
  * `graft.system.bucket/truncate/years/months/days/hours` must agree
  * value-for-value with the WRITER's transform expressions
  * ([[T.column]]) — the invariant that makes them usable for clustered
  * distributions and storage-partitioned joins later. */
class GraftV2FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft_v2fn_wh_").toString

  private lazy val spark: SparkSession = {
    val s = GraftSessions.builder("local[4]", "4")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .appName("graft-v2-functions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("SQL invocation under the system namespace") {
    val r = spark.sql(
      """SELECT graft.system.bucket(4, CAST(42 AS BIGINT)) AS b,
        |       graft.system.truncate(3, 'hello') AS ts,
        |       graft.system.truncate(10, 1234) AS ti,
        |       graft.system.days(TIMESTAMP_NTZ '2024-01-05 10:30:00') AS d,
        |       graft.system.years(DATE '2024-06-01') AS y,
        |       graft.system.months(DATE '2024-06-01') AS m,
        |       graft.system.hours(TIMESTAMP_NTZ '1970-01-02 03:00:00') AS h
        |""".stripMargin).head
    assert(r.getInt(0) === T.bucketLong(42L, 4))
    assert(r.getString(1) === "hel")
    assert(r.getInt(2) === 1230)
    assert(r.getInt(3) === java.time.LocalDate.of(2024, 1, 5).toEpochDay.toInt)
    assert(r.getInt(4) === 54)   // 2024 - 1970
    assert(r.getInt(5) === 54 * 12 + 5)
    assert(r.getInt(6) === 27)   // 24 + 3
    // SHOW FUNCTIONS surfaces them
    val listed = spark.sql("SHOW FUNCTIONS IN graft.system")
      .collect().map(_.getString(0)).toSet
    assert(Seq("bucket", "days", "truncate").forall(f =>
      listed.exists(_.endsWith(f))), listed)
  }

  test("value-for-value parity with the writer's transform expressions") {
    import spark.implicits._
    // adversarial values: pre-1970, DST-repeated instants, month edges
    val ts = Seq(
      "1969-12-31 23:59:59", "1970-01-01 00:00:00", "2024-02-29 23:00:00",
      "2002-10-27 01:30:00", // DST fall-back repeated wall-clock hour
      "1968-03-01 12:00:00", "2030-12-31 00:00:01")
    val df = ts.toDF("s")
      .withColumn("ts", col("s").cast("timestamp"))
      .withColumn("ntz", col("s").cast("timestamp_ntz"))
      .withColumn("dt", col("s").cast("date"))
      .withColumn("l", unix_micros(col("ts")))
      .withColumn("str", concat(lit("v"), col("s")))
      // negative decimals must truncate DOWN (unscaled floored mod)
      .withColumn("dec", ((col("l") % 100000) / 100).cast("decimal(12,2)"))
    def writerCol(t: T.Transform, c: org.apache.spark.sql.Column,
                  dt: org.apache.spark.sql.types.DataType) =
      T.column(t, c, dt, spark)
    import org.apache.spark.sql.types._
    val checked = df.select(
      (expr("graft.system.days(ts)") <=>
        writerCol(T.Day, col("ts"), TimestampType)).as("d_ts"),
      (expr("graft.system.hours(ts)") <=>
        writerCol(T.Hour, col("ts"), TimestampType)).as("h_ts"),
      (expr("graft.system.months(ts)") <=>
        writerCol(T.Month, col("ts"), TimestampType)).as("m_ts"),
      (expr("graft.system.years(ts)") <=>
        writerCol(T.Year, col("ts"), TimestampType)).as("y_ts"),
      (expr("graft.system.days(ntz)") <=>
        writerCol(T.Day, col("ntz"), TimestampNTZType)).as("d_ntz"),
      (expr("graft.system.days(dt)") <=>
        writerCol(T.Day, col("dt"), DateType).cast("int")).as("d_dt"),
      (expr("graft.system.months(dt)") <=>
        writerCol(T.Month, col("dt"), DateType)).as("m_dt"),
      (expr("graft.system.bucket(16, l)") <=>
        writerCol(T.Bucket(16), col("l"), LongType)).as("b_l"),
      (expr("graft.system.bucket(16, str)") <=>
        writerCol(T.Bucket(16), col("str"), StringType)).as("b_s"),
      (expr("graft.system.truncate(5, l)") <=>
        writerCol(T.Truncate(5), col("l"), LongType)).as("t_l"),
      (expr("graft.system.truncate(4, str)") <=>
        writerCol(T.Truncate(4), col("str"), StringType)).as("t_s"),
      (expr("graft.system.truncate(50, dec)") <=>
        writerCol(T.Truncate(50), col("dec"), DecimalType(12, 2))).as("t_d"),
      (expr("graft.system.bucket(16, dec)") <=>
        writerCol(T.Bucket(16), col("dec"), DecimalType(12, 2))).as("b_d"))
    val rows = checked.collect()
    rows.foreach { r =>
      (0 until r.length).foreach { i =>
        assert(r.getBoolean(i),
          s"${checked.columns(i)} diverged from the writer transform")
      }
    }
  }

  test("decimal truncate at the type's lower bound widens, never nulls") {
    import spark.implicits._
    // Iceberg TruncateDecimal: -99.99 trunc W=100 (unscaled units) =
    // -100.00 — one digit BELOW DECIMAL(4,2); the result type carries
    // precision+1 so the value survives instead of clamping to null
    val r = spark.sql(
      "SELECT graft.system.truncate(100, CAST(-99.99 AS DECIMAL(4,2))) AS t")
    assert(r.schema("t").dataType ===
      org.apache.spark.sql.types.DecimalType(5, 2))
    assert(r.head.getDecimal(0) === new java.math.BigDecimal("-100.00"))
    // writer transform column agrees (same widened domain)
    import org.apache.spark.sql.functions._
    val w = Seq("-99.99").toDF("s")
      .select(graft.iceberg.IcebergTransforms.column(
        graft.iceberg.IcebergTransforms.Truncate(100),
        col("s").cast("decimal(4,2)"),
        org.apache.spark.sql.types.DecimalType(4, 2), spark).as("t"))
    assert(w.head.getDecimal(0).compareTo(new java.math.BigDecimal("-100.00")) == 0)
  }

  test("NULLs pass through; bad widths and types fail loudly") {
    assert(spark.sql("SELECT graft.system.bucket(4, CAST(NULL AS BIGINT))")
      .head.isNullAt(0))
    assert(spark.sql("SELECT graft.system.days(CAST(NULL AS TIMESTAMP_NTZ))")
      .head.isNullAt(0))
    val e = intercept[Exception] {
      spark.sql("SELECT graft.system.bucket(0, 7)").collect()
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft.system.hours(DATE '2024-01-01')").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("not supported"), e2.getMessage)
  }
}
