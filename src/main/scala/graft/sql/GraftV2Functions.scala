package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.iceberg.{IcebergTransforms => T}

/** The Iceberg partition transforms as DSv2 CATALOG FUNCTIONS —
  * `SELECT graft.system.bucket(4, id)`, `days(ts)`, `truncate(3, s)` —
  * bound to the SAME value-level arithmetic the writer's
  * [[graft.iceberg.IcebergTransforms.column]] and the pruner use, so a
  * query-side transform value always equals the manifest's partition
  * ordinal. This is the groundwork Spark's planner needs to reason about
  * graft partitioning as expressions (clustered write distributions,
  * storage-partitioned joins): `V2ExpressionUtils` resolves a table's
  * `bucket`/`days` Transform against the owning catalog's
  * FunctionCatalog, which [[GraftCatalog]] now implements.
  *
  * Date/timestamp ordinals follow the spec's UTC-instant definition:
  * timestamp (with local zone) ordinals derive from the instant's micros
  * with exact floor division — never session-zone date parts (the
  * DST-ambiguity rationale documented at IcebergTransforms.column).
  */
object GraftV2Functions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket"   => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years"  | "year"  => Some(dateUnbound("years", T.Year))
    case "months" | "month" => Some(dateUnbound("months", T.Month))
    case "days"   | "day"   => Some(dateUnbound("days", T.Day))
    case "hours"  | "hour"  => Some(dateUnbound("hours", T.Hour))
    case _ => None
  }

  /** Can this catalog bind the Iceberg metadata transform (e.g.
    * "bucket[16]") over the given source type? `plannerClusters`
    * consults it before declaring a clustered distribution: a transform
    * the FunctionCatalog can't bind would otherwise turn the V2 write's
    * analysis into a failure (V2ExpressionUtils surfaces the bind
    * exception) instead of degrading to an unspecified distribution. */
  def bindable(transform: String, sourceType: DataType): Boolean = {
    val t = transform.toLowerCase
    if (t == "identity" || t == "void") return true
    val (fname, input) =
      if (t.startsWith("bucket"))
        ("bucket", StructType(Seq(
          StructField("n", IntegerType), StructField("v", sourceType))))
      else if (t.startsWith("truncate"))
        ("truncate", StructType(Seq(
          StructField("w", IntegerType), StructField("v", sourceType))))
      else (t, StructType(Seq(StructField("v", sourceType))))
    load(fname).exists { u =>
      try { u.bind(input); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }
  }

  private def micros(row: InternalRow, i: Int): Long = row.getLong(i)

  /** Epoch-micros → transform ordinal (exact integer arithmetic; floor
    * division correct for pre-1970 instants). */
  private def ordinalOfMicros(t: T.Transform, us: Long): Int = t match {
    case T.Hour => Math.floorDiv(us, 3600000000L).toInt
    case T.Day  => Math.floorDiv(us, 86400000000L).toInt
    case T.Month =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, 86400000000L))
      T.monthOrdinal(d).toInt
    case T.Year =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, 86400000000L))
      T.yearOrdinal(d).toInt
    case other => throw new IllegalStateException(s"not a date transform: $other")
  }

  private def ordinalOfDays(t: T.Transform, days: Int): Int = t match {
    case T.Day => days
    case T.Month => T.monthOrdinal(java.time.LocalDate.ofEpochDay(days.toLong)).toInt
    case T.Year => T.yearOrdinal(java.time.LocalDate.ofEpochDay(days.toLong)).toInt
    case other => throw new IllegalArgumentException(
      s"$other is not applicable to a date")
  }

  // ---- bucket(n, v) --------------------------------------------------------

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col) — Iceberg bucket transform (murmur3)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets INT, value); got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.sql}")
      val vt = inputType.fields(1).dataType
      vt match {
        case IntegerType | LongType | DateType | TimestampType |
             TimestampNTZType | StringType | _: DecimalType => ()
        case other => throw new UnsupportedOperationException(
          s"bucket over ${other.sql} is not supported")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${vt.sql})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(1)) return null
          val n = input.getInt(0)
          require(n > 0, s"bucket: numBuckets must be positive, got $n")
          vt match {
            case IntegerType | DateType =>
              Int.box(T.bucketLong(input.getInt(1).toLong, n))
            case LongType | TimestampType | TimestampNTZType =>
              Int.box(T.bucketLong(input.getLong(1), n))
            case StringType => Int.box(T.bucketUtf8(input.getUTF8String(1), n))
            case d: DecimalType =>
              Int.box(T.bucketDecimal(
                input.getDecimal(1, d.precision, d.scale), d.scale, n))
            case _ => throw new IllegalStateException("unreachable")
          }
        }
      }
    }
  }

  // ---- truncate(w, v) ------------------------------------------------------

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col) — Iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width INT, value); got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate: width must be INT, got ${inputType.fields(0).dataType.sql}")
      val vt = inputType.fields(1).dataType
      vt match {
        case IntegerType | LongType | StringType | _: DecimalType => ()
        case other => throw new UnsupportedOperationException(
          s"truncate over ${other.sql} is not supported")
      }
      // decimal truncate WIDENS precision by one (Iceberg TruncateDecimal
      // computes in the unscaled domain with no precision check, so
      // -99.99 trunc 100 over DECIMAL(4,2) = -100.00) — the declared
      // result type must carry it or the value would be clamped to null
      val outType: DataType = vt match {
        case d: DecimalType => T.truncateDecimalType(d)
        case other => other
      }
      new ScalarFunction[AnyRef] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
        override def resultType(): DataType = outType
        override def name(): String = "truncate"
        override def canonicalName(): String = s"graft.truncate(${vt.sql})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): AnyRef = {
          if (input.isNullAt(1)) return null
          val w = input.getInt(0)
          require(w > 0, s"truncate: width must be positive, got $w")
          vt match {
            case IntegerType =>
              Int.box(T.truncateLong(input.getInt(1).toLong, w.toLong).toInt)
            case LongType => Long.box(T.truncateLong(input.getLong(1), w.toLong))
            case StringType =>
              org.apache.spark.unsafe.types.UTF8String.fromString(
                T.truncateString(input.getUTF8String(1).toString, w))
            case d: DecimalType =>
              // spec decimal truncate: v - (v % W) on the UNSCALED value,
              // emitted at the widened result precision (matches the
              // writer's transform column and Iceberg's TruncateDecimal).
              // Null only past the absolute 38-digit cap — a degenerate
              // W > 10^37; the widened cast on the writer side nulls the
              // same way, so the two stay consistent even there.
              val o = T.truncateDecimalType(d)
              val v = input.getDecimal(1, d.precision, d.scale)
              val unscaled = v.toJavaBigDecimal.unscaledValue
              val t = org.apache.spark.sql.types.Decimal(
                new java.math.BigDecimal(
                  T.truncateDecimalUnscaled(unscaled, w.toLong), o.scale))
              if (t.changePrecision(o.precision, o.scale)) t else null
            case _ => throw new IllegalStateException("unreachable")
          }
        }
      }
    }
  }

  // ---- years/months/days/hours(v) -----------------------------------------

  private def dateUnbound(fname: String, t: T.Transform): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fname
      override def description(): String =
        s"$fname(col) — Iceberg $fname transform ordinal (UTC instant)"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.fields.length == 1,
          s"$fname takes one date/timestamp argument; got ${inputType.simpleString}")
        val vt = inputType.fields(0).dataType
        vt match {
          case DateType if t != T.Hour => ()
          case TimestampType | TimestampNTZType => ()
          case other => throw new UnsupportedOperationException(
            s"$fname over ${other.sql} is not supported")
        }
        new ScalarFunction[Integer] {
          override def inputTypes(): Array[DataType] = Array(vt)
          override def resultType(): DataType = IntegerType
          override def name(): String = fname
          override def canonicalName(): String = s"graft.$fname(${vt.sql})"
          override def isResultNullable: Boolean = true
          override def produceResult(input: InternalRow): Integer = {
            if (input.isNullAt(0)) return null
            vt match {
              case DateType => Int.box(ordinalOfDays(t, input.getInt(0)))
              case _ => Int.box(ordinalOfMicros(t, micros(input, 0)))
            }
          }
        }
      }
    }
}
