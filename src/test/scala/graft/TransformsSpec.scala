package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.IcebergTransforms
import graft.iceberg.IcebergTransforms._

/** Iceberg partition transforms: the spec's published murmur3 test vectors
  * (Appendix B — if these drift, bucket pruning on FOREIGN-written tables
  * silently reads the wrong 1/N of the data), truncate semantics, and
  * agreement between the writer's Spark column expressions and the
  * pruner's scalar projections. */
class TransformsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-transforms").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- Iceberg spec Appendix B hash vectors --------------------------------

  test("bucket hash of int/long 34 matches the spec vector") {
    assert(hashLong(34L) === 2017239379)
  }

  test("bucket hash of date 2017-11-16 (epoch day) matches the spec vector") {
    assert(hashLong(java.time.LocalDate.parse("2017-11-16").toEpochDay) === -653330422)
  }

  test("bucket hash of timestamp 2017-11-16T22:31:08 (micros) matches the spec vector") {
    val us = java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(hashLong(us) === -2047944441)
  }

  test("bucket hash of string 'iceberg' matches the spec vector") {
    assert(hashString("iceberg") === 1210000089)
  }

  test("bucket hash of decimal 14.20 matches the spec vector") {
    assert(hashDecimal(java.math.BigInteger.valueOf(1420)) === -500754589)
  }

  // ---- transform parsing ---------------------------------------------------

  test("transform names parse per spec, unknown degrades") {
    assert(parse("bucket[16]") === Bucket(16))
    assert(parse("truncate[4]") === Truncate(4))
    assert(parse("days") === Day)
    assert(parse("hour") === Hour)
    assert(parse("identity") === Identity)
    assert(parse("bucket[0]") === Unknown)   // zero buckets is invalid
    assert(parse("zorder") === Unknown)
  }

  // ---- truncate semantics --------------------------------------------------

  test("truncateLong floors negatives down (spec: truncate(-7, 10) = -10)") {
    assert(truncateLong(-7L, 10L) === -10L)
    assert(truncateLong(7L, 10L) === 0L)
    assert(truncateLong(10L, 10L) === 10L)
    assert(truncateLong(-10L, 10L) === -10L)
  }

  test("truncateString counts code points, not UTF-16 units") {
    assert(truncateString("iceberg", 3) === "ice")
    assert(truncateString("ab", 5) === "ab")
    // 𐐷 is a supplementary char: 2 UTF-16 units, ONE code point
    assert(truncateString("𐐷xyz", 2) === "𐐷x")
  }

  // ---- writer column expression ↔ scalar projection agreement -------------

  test("graft_bucket column agrees with bucketLong for longs") {
    import spark.implicits._
    val n = 16
    val vals = Seq(-100L, -1L, 0L, 1L, 34L, 12345678901L)
    val df = vals.toDF("x").withColumn("b",
      IcebergTransforms.column(Bucket(n), col("x"), LongType, spark))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vals.foreach(v => assert(got(v) === bucketLong(v, n), s"value $v"))
  }

  test("graft_bucket column agrees with hashString for strings") {
    import spark.implicits._
    val n = 8
    val vals = Seq("", "iceberg", "héllo", "𐐷𐐷")
    val df = vals.toDF("s").withColumn("b",
      IcebergTransforms.column(Bucket(n), col("s"), StringType, spark))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vals.foreach(v => assert(got(v) === bucketOf(hashString(v), n), s"value '$v'"))
  }

  test("truncate string column (substring) agrees with truncateString on code points") {
    import spark.implicits._
    val vals = Seq("iceberg", "ab", "𐐷xyz", "")
    val df = vals.toDF("s").withColumn("t",
      IcebergTransforms.column(Truncate(2), col("s"), StringType, spark))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vals.foreach(v => assert(got(v) === truncateString(v, 2), s"value '$v'"))
  }

  test("hour column over timestamp_ntz agrees with hourOrdinalOfMicros") {
    import spark.implicits._
    val micros = Seq(0L, 3599999999L, 3600000000L, 1704459599000000L, -1L)
    // timestamp_micros → NTZ is shift-free under the UTC session
    // (a long→timestamp CAST would interpret the value as seconds)
    val df = micros.toDF("us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .withColumn("h", IcebergTransforms.column(Hour, col("ts"), TimestampNTZType, spark))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    micros.foreach(us =>
      assert(got(us).toLong === hourOrdinalOfMicros(us), s"micros $us"))
  }

  test("graft_bucket is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_bucket(34L, 16) AS b").collect().head.getInt(0)
    assert(r === bucketLong(34L, 16))
  }

  test("graft_bucket rejects bucket counts outside Int range instead of truncating") {
    graft.functions.GraftFunctions.register(spark)
    // 4294967312L wraps to 16 under toInt — must fail analysis, not
    // silently bucket mod 16
    val e = intercept[Throwable] {
      spark.sql("SELECT graft_bucket(34L, 4294967312)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("graft_bucket")))
  }

  test("graft_bucket rejects non-positive bucket counts at analysis") {
    graft.functions.GraftFunctions.register(spark)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // n = 0 would divide by zero at execution; negative n would flip the
    // bucket sign — both must fail analysis uniformly with the writer path
    Seq("0", "-3", "0L", "-9223372036854775808").foreach { n =>
      val e = intercept[Throwable] {
        spark.sql(s"SELECT graft_bucket(34L, $n)").collect()
      }
      assert(messages(e).exists(_.contains("graft_bucket")), s"count $n")
    }
  }

  test("date-transform columns over TimestampType are session-timezone-independent") {
    import spark.implicits._
    // The pruner projects predicates with UTC-fixed arithmetic; the writer
    // column must produce the same ordinals even in a non-UTC session
    // (ADVICE r4: hour()/cast(DateType) over ltz reads the session zone).
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // 2024-11-03 08:00-10:00 UTC is the DST fall-back window in LA: the
      // local wall clock 01:00-02:00 repeats, so any wall-clock rebase
      // (e.g. convert_timezone) is ambiguous there and lands an hour off
      // for the second pass (ADVICE r5). 2024-03-10 10:00-11:00 UTC is the
      // spring-forward gap (02:00-03:00 local never exists).
      val dstEdges = Seq(
        "2024-11-03T08:00:00Z", "2024-11-03T08:30:00Z", "2024-11-03T08:59:59Z",
        "2024-11-03T09:00:00Z", "2024-11-03T09:30:00Z", "2024-11-03T09:59:59Z",
        "2024-11-03T10:00:00Z",
        "2024-03-10T09:59:59Z", "2024-03-10T10:00:00Z", "2024-03-10T10:30:00Z",
        "2024-03-10T11:00:00Z")
        .map(s => java.time.Instant.parse(s).toEpochMilli * 1000L)
      val micros = Seq(0L, 3599999999L, 3600000000L, 1704459599000000L,
        -1L, 86399999999L, 1731796268000000L) ++ dstEdges
      val df = micros.toDF("us")
        .withColumn("ts", timestamp_micros(col("us"))) // TimestampType (ltz)
        .withColumn("h", IcebergTransforms.column(Hour, col("ts"), TimestampType, spark))
        .withColumn("d", IcebergTransforms.column(Day, col("ts"), TimestampType, spark))
        .withColumn("m", IcebergTransforms.column(Month, col("ts"), TimestampType, spark))
        .withColumn("y", IcebergTransforms.column(Year, col("ts"), TimestampType, spark))
      val got = df.collect()
        .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
        .toMap
      micros.foreach { us =>
        val (h, d, m, y) = got(us)
        val ld = dateOfMicros(us)
        assert(h.toLong === hourOrdinalOfMicros(us), s"hour of $us")
        assert(d.toLong === dayOrdinalOfMicros(us), s"day of $us")
        assert(m.toLong === monthOrdinal(ld), s"month of $us")
        assert(y.toLong === yearOrdinal(ld), s"year of $us")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
