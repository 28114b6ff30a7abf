package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering values, composed from builtin codegen'd
  * expressions only — shifts, masks and arithmetic, no UDF. The z-value
  * interleaves the bits of each column's SCALED RANK (min/max-normalized
  * to 32 bits for 2 columns, 21 bits for 3), so sorting by it clusters
  * rows that are close in EVERY dimension into the same files — after a
  * clustered rewrite each file covers a small box of the key space and a
  * multi-dimension box predicate prunes on all dimensions at once
  * (single-column sort gives that for the leading column only). */
object ZOrder {

  /** Order-preserving long view of a clustering column. */
  def rank(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case DateType => unix_date(c).cast(LongType)
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case FloatType | DoubleType =>
      // a monotone long view is all scaling needs; fractional detail
      // below 1.0 is lost, which only coarsens the clustering grid
      c.cast(DoubleType).cast(LongType)
    case other => throw new IllegalArgumentException(
      s"z-order does not support ${other.simpleString} columns")
  }

  private def spread2(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  private def spread3(x: Column): Column = {
    var v = x.bitwiseAND(lit(0x1FFFFFL))
    v = v.bitwiseOR(shiftleft(v, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x1249249249249249L))
    v
  }

  /** Scale a long rank into [0, 2^bits) given the column's observed
    * min/max (double intermediary: full-range longs would overflow, and
    * clustering only needs relative position, not exact bits). */
  private def scaled(c: Column, min: Long, max: Long, bits: Int): Column =
    if (max <= min) lit(0L)
    else least(lit((1L << bits) - 1), greatest(lit(0L),
      (((c - lit(min)).cast(DoubleType) / lit((max - min).toDouble)) *
        lit(((1L << bits) - 1).toDouble)).cast(LongType)))

  /** The z-value of 2 or 3 ranked columns with their observed ranges. */
  def zvalue(ranked: Seq[Column], mins: Seq[Long], maxes: Seq[Long]): Column = {
    require(ranked.size >= 2 && ranked.size <= 3,
      s"z-order takes 2 or 3 columns, got ${ranked.size}")
    require(mins.size == ranked.size && maxes.size == ranked.size)
    ranked.size match {
      case 2 =>
        // 31 bits per column, not 32: the second column's top bit would
        // land on bit 63 — the Long SIGN bit — and negative z-values
        // would sort before positive ones, breaking the curve
        val Seq(a, b) = ranked.zipWithIndex.map { case (c, i) =>
          spread2(scaled(c, mins(i), maxes(i), 31))
        }
        a.bitwiseOR(shiftleft(b, 1))
      case 3 =>
        val Seq(a, b, c3) = ranked.zipWithIndex.map { case (c, i) =>
          spread3(scaled(c, mins(i), maxes(i), 21))
        }
        a.bitwiseOR(shiftleft(b, 1)).bitwiseOR(shiftleft(c3, 2))
    }
  }
}
