package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Runtime companion for [[DecimalSum128]]: reassemble the two-long
  * accumulator into a Decimal once per GROUP (never per row). */
object DecimalSum128 {
  /** Largest unscaled magnitude a DecimalType(38, _) can hold. */
  private val MaxUnscaled38 = BigInt("9" * 38)

  /** (hi, lo) two's-complement 128-bit → Decimal(38, scale); null on the
    * (practically unreachable) >38-digit overflow — the same
    * null-on-overflow contract as Spark's decimal Sum in LEGACY mode.
    * DOCUMENTED ANSI DIVERGENCE (ADVICE r19): under ANSI the built-in
    * Sum raises ARITHMETIC_OVERFLOW at 28 digits; graft_dsum instead
    * stays exact to 38 digits and returns null past that. The overflow
    * domain only WIDENS (inputs that sum past 1e22 of decimal(18,6)
    * value would need ~10^16 max-magnitude rows), and DuckDB's int128
    * accumulator behaves like the wide form, so the oracle-checked
    * domain is unaffected. */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    // lo is a full unsigned 64-bit word; BigInt(lo) would sign-extend
    val big = (BigInt(hi) << 64) + (BigInt(lo >>> 1) << 1) + (lo & 1L)
    if (big.abs > MaxUnscaled38) null
    else Decimal(BigDecimal(big, scale), 38, scale)
  }
}

/** `graft_dsum(d)` — exact SUM over a compact decimal column (precision
  * ≤ 18, i.e. Long-backed) with a primitive two-long accumulator.
  *
  * Spark's built-in `sum(decimal(18,6))` widens the accumulator to
  * decimal(28,6); above 18 digits an UnsafeRow stores decimals as
  * BigInteger byte arrays, so every row's update deserializes and
  * reserializes a java.math.BigDecimal — measured at ~0.35 s per
  * aggregate per 600k rows at sf0.1 (the whole scan is 0.28 s). This
  * aggregate keeps the exact unscaled sum in two primitive long buffer
  * slots as a 128-bit two's-complement value (update/merge are pure
  * 64-bit adds + a carry bit, whole-stage-codegen-friendly), and
  * reassembles a Decimal once per group.
  *
  * Semantics match `sum(child)` exactly:
  *  - nulls are skipped; an empty / all-null group yields NULL;
  *  - the value is the exact decimal sum (the unscaled sum is exact in
  *    128 bits up to ~1.7e38 — vs the built-in's decimal(28,6) headroom,
  *    so this widens, never narrows, the non-overflow domain);
  *  - result is Decimal(38, scale) — same VALUE as the built-in's
  *    decimal(p+10, scale); every caller rounds/casts before output, so
  *    surfaced column types and values are unchanged.
  */
case class DecimalSum128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private def childScale: Int = child.dataType match {
    case d: DecimalType => d.scale
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dsum requires a compact decimal (precision <= 18) argument, got ${other.sql}")
  }

  override def dataType: DataType = DecimalType(38, childScale)
  override def nullable: Boolean = true

  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val nonEmpty =
    AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(lo, hi, nonEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Carry-out bit of the unsigned 64-bit addition a + b = s:
    * ((a & b) | ((a | b) & ~s)) >>> 63 — the standard two-word add. */
  private def carryOf(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  /** Wrapping two's-complement add — the 128-bit arithmetic RELIES on
    * 64-bit wraparound, so these adds must stay LEGACY even under the
    * ANSI default (Spark 4): an ANSI Add throws on exactly the overflow
    * the carry logic accounts for. */
  private def addWrap(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  override lazy val updateExpressions: Seq[Expression] = {
    val uv = UnscaledValue(child)
    val nlo = addWrap(lo, uv)
    // adding a SIGNED 64-bit value into the 128-bit pair: the high word
    // gains the value's sign extension plus the low word's carry
    val nhi = addWrap(addWrap(hi, ShiftRight(uv, Literal(63))), carryOf(lo, uv, nlo))
    Seq(
      If(IsNull(child), lo, nlo),
      If(IsNull(child), hi, nhi),
      Or(nonEmpty, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val nlo = addWrap(lo.left, lo.right)
    // both hi words already carry their own sign information — only the
    // low words' carry crosses over
    Seq(
      nlo,
      addWrap(addWrap(hi.left, hi.right), carryOf(lo.left, lo.right, nlo)),
      Or(nonEmpty.left, nonEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(nonEmpty,
      StaticInvoke(DecimalSum128.getClass, dataType, "toDecimal",
        Seq(hi, lo, Literal(childScale)),
        Seq(LongType, LongType, IntegerType), returnNullable = true),
      Literal(null, dataType))

  override protected def withNewChildInternal(c: Expression): DecimalSum128 =
    copy(child = c)

  override def prettyName: String = "graft_dsum"
}
