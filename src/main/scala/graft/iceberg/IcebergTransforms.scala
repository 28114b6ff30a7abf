package graft.iceberg

import java.time.LocalDate

import org.apache.spark.sql.{Column => SqlColumn, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg partition-transform semantics — the full transform set of the
  * table spec (identity, year/month/day/hour, bucket[N], truncate[W]) —
  * shared by three consumers that MUST agree bit-for-bit:
  *
  *  - the writer ([[IcebergWriter]]): computes each row's partition value
  *    as a Spark column expression ([[column]]);
  *  - the pruner ([[IcebergPruning]]): projects a predicate value into the
  *    same ordinal domain to decide whether a file's partition tuple can
  *    possibly match;
  *  - the SQL surface: `graft_bucket(col, n)` exposes the bucket function.
  *
  * Bucketing is the spec's murmur3_x86_32(seed=0) over the single-value
  * serialization (Appendix B): int/long/date/timestamp hash their 8-byte
  * little-endian long form, strings their UTF-8 bytes, decimals their
  * minimal-length big-endian unscaled two's complement. The reference
  * decodes transform names but never evaluates them (SURVEY §2.10) — on a
  * 100 TB bucket- or truncate-partitioned table this is the difference
  * between scanning 1/N of the files and scanning all of them.
  */
object IcebergTransforms {

  sealed trait Transform
  case object Identity extends Transform
  case object Year extends Transform
  case object Month extends Transform
  case object Day extends Transform
  case object Hour extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform
  case object Unknown extends Transform

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Spec spelling (`bucket[16]`) plus the singular/plural aliases the
    * date transforms appear under in the wild. Unrecognized → Unknown →
    * every consumer degrades conservatively (no pruning, write rejects). */
  def parse(t: String): Transform = t.trim.toLowerCase match {
    case "identity" => Identity
    case "year" | "years" => Year
    case "month" | "months" => Month
    case "day" | "days" => Day
    case "hour" | "hours" => Hour
    case BucketRe(n) if n.toInt > 0 => Bucket(n.toInt)
    case TruncateRe(w) if w.toInt > 0 => Truncate(w.toInt)
    case _ => Unknown
  }

  // ---- murmur3_x86_32, seed 0 (public domain; Iceberg spec Appendix B) ----

  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val n4 = data.length & ~3
    var i = 0
    while (i < n4) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val tail = data.length & 3
    if (tail >= 3) k1 ^= (data(n4 + 2) & 0xff) << 16
    if (tail >= 2) k1 ^= (data(n4 + 1) & 0xff) << 8
    if (tail >= 1) {
      k1 ^= data(n4) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/time/timestamp all hash as the 8-byte LE long. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int = murmur3(s.getBytes("UTF-8"))

  /** Decimal: minimal big-endian two's complement of the unscaled value —
    * exactly `BigInteger.toByteArray`. */
  def hashDecimal(unscaled: java.math.BigInteger): Int = murmur3(unscaled.toByteArray)

  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // Codegen entry points (Scala object → static forwarders on the class,
  // callable from generated Java):
  def bucketLong(v: Long, n: Int): Int = bucketOf(hashLong(v), n)
  def bucketUtf8(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    bucketOf(murmur3(s.getBytes), n)
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, scale: Int, n: Int): Int =
    bucketOf(hashDecimal(d.toJavaBigDecimal.setScale(scale).unscaledValue), n)

  // ---- ordinal domains (match the writer's partition-value columns) ------

  def hourOrdinalOfMicros(us: Long): Long = Math.floorDiv(us, 3600000000L)
  def dayOrdinalOfMicros(us: Long): Long = Math.floorDiv(us, 86400000000L)
  def dateOfMicros(us: Long): LocalDate = LocalDate.ofEpochDay(dayOrdinalOfMicros(us))
  def monthOrdinal(d: LocalDate): Long = (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
  def yearOrdinal(d: LocalDate): Long = (d.getYear - 1970).toLong

  /** `v - (v mod w)` with a floored mod, so negatives truncate DOWN
    * (Iceberg: truncate(-7, 10) = -10, not 0). */
  def truncateLong(v: Long, w: Long): Long = v - Math.floorMod(v, w)

  /** Decimal truncate (spec: `v - (v % W)` on the UNSCALED value, W in
    * unscaled units). BigInteger.mod is already floored for a positive
    * modulus, so negatives truncate down like the long form. */
  def truncateDecimalUnscaled(
      unscaled: java.math.BigInteger, w: Long): java.math.BigInteger =
    unscaled.subtract(unscaled.mod(java.math.BigInteger.valueOf(w)))

  /** Result type of decimal truncate: ONE extra digit of precision
    * (capped at 38), because truncation toward -inf can land one unit of
    * W below the source type's lower bound — Iceberg's TruncateDecimal
    * has no precision check, so the partition value must not be clamped
    * back to the source precision. Shared by the writer's transform
    * column and the bound catalog function so both sides canonicalize to
    * the same type. */
  def truncateDecimalType(d: org.apache.spark.sql.types.DecimalType)
      : org.apache.spark.sql.types.DecimalType =
    org.apache.spark.sql.types.DecimalType(
      math.min(d.precision + 1, org.apache.spark.sql.types.DecimalType.MAX_PRECISION),
      d.scale)

  /** First `w` Unicode code points — the same definition Spark's
    * `substring(c, 1, w)` uses, so writer columns and pruner projections
    * agree on supplementary characters. */
  def truncateString(s: String, w: Int): String = {
    val cp = s.codePointCount(0, s.length)
    if (cp <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }

  // ---- the transform as a Spark column over the source ------------------

  /** The transform applied to source column `c` of type `dt`, as a Spark
    * expression in the manifest's ordinal domain (day = epoch days,
    * month = (y-1970)*12+(m-1), year = y-1970, hour = epoch hours,
    * bucket = [0, n), truncate = same type as source). All arithmetic is
    * exact-integer (no doubles), so ordinals match the pruner's for every
    * representable value.
    *
    * Needs the session only to reach [[graft.functions.IcebergBucket]]
    * through the function registry — `call_function` is the supported way
    * to wrap a custom expression in a `Column` (the direct wrapper,
    * `classic.ExpressionUtils`, is `private[sql]`). */
  def column(t: Transform, c: SqlColumn, dt: DataType, spark: SparkSession): SqlColumn = {
    t match {
      case Identity => c
      case Day | Month | Year | Hour if dt == TimestampType =>
        // Iceberg date-transform ordinals are defined over the UTC instant,
        // but year()/hour()/cast(DateType) over TimestampType (= TIMESTAMP
        // WITH LOCAL TIME ZONE) read the SESSION zone, and a
        // convert_timezone rebase re-interprets DST-ambiguous wall clocks
        // (instants in a fall-back repeated hour land an hour off). So
        // derive ordinals from the instant's micros with exact long
        // arithmetic — this mirrors hourOrdinalOfMicros/dateOfMicros for
        // EVERY instant in any session zone. The numerator is made
        // divisible before `div`, so truncation equals floor division.
        val us = unix_micros(c)
        def floorDiv(d: Long): SqlColumn =
          call_function("div", us - pmod(us, lit(d)), lit(d))
        lazy val utcDate = date_from_unix_date(floorDiv(86400000000L).cast(IntegerType))
        t match {
          case Hour => floorDiv(3600000000L).cast(IntegerType)
          case Day => floorDiv(86400000000L).cast(IntegerType)
          case Month => (year(utcDate) - lit(1970)) * lit(12) + month(utcDate) - lit(1)
          case Year => year(utcDate) - lit(1970)
          case _ => throw new IllegalStateException("unreachable")
        }
      // NTZ and DateType inputs are zone-free: date-part functions are safe.
      case Day => datediff(c.cast(DateType), lit("1970-01-01").cast(DateType))
      case Month => (year(c) - lit(1970)) * lit(12) + month(c) - lit(1)
      case Year => year(c) - lit(1970)
      case Hour =>
        // days*24 + hour-of-day: exact integers, floors correctly pre-1970
        // (datediff is negative, hour() stays 0-23).
        datediff(c.cast(DateType), lit("1970-01-01").cast(DateType)) * lit(24) + hour(c)
      case Bucket(n) =>
        graft.functions.GraftFunctions.register(spark)
        call_function("graft_bucket", c, lit(n))
      case Truncate(w) => dt match {
        case IntegerType | LongType | ShortType | ByteType => c - pmod(c, lit(w))
        case StringType => substring(c, 1, w)
        case d: org.apache.spark.sql.types.DecimalType =>
          // W in unscaled units: the modulus decimal is W·10^-scale, and
          // pmod keeps the remainder non-negative (floored like the long
          // form). Keep the subtraction's NATURAL precision (+1): Iceberg's
          // TruncateDecimal computes in the unscaled domain with no
          // precision check, so a value within W of the type's lower bound
          // truncates BELOW the declared precision (-99.99 trunc 100 over
          // DECIMAL(4,2) = -100.00) — casting back to the source type would
          // null it and route the row to the null tuple, which an external
          // reader evaluating the spec transform for pruning would then
          // miss. (resultType in GraftV2Functions widens identically.)
          (c - pmod(c, lit(java.math.BigDecimal.valueOf(w.toLong, d.scale))))
            .cast(truncateDecimalType(d))
        case other => throw new IllegalArgumentException(
          s"truncate[$w] over ${other.sql} not supported")
      }
      case Unknown => throw new IllegalArgumentException(s"unknown transform")
    }
  }
}
