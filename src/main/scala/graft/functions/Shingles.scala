package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Shingles]]: one tight loop over the token array. */
object Shingles {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    if (distinct) {
      // LinkedHashSet keeps FIRST-occurrence order — array_distinct's
      // contract; UTF8String equality/hash are byte-level
      val seen = new java.util.LinkedHashSet[UTF8String](
        Integer.highestOneBit(math.min(cnt, 1 << 20)) * 2)
      var i = 0
      while (i < cnt) {
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        seen.add(UTF8String.concatWs(Space, parts: _*)): Unit
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `graft_shingles(tokens, n, distinct)` — the word n-grams of a string
  * array, space-joined, optionally first-occurrence-distinct.
  *
  * Value-identical (on the engine's no-null token arrays — `split`
  * never yields null elements) to the HOF formulation it replaces:
  * `[array_distinct](transform(sequence(1, size(t) - n + 1),
  * i -> concat_ws(' ', element_at(t, i), ..., element_at(t, i+n-1))))`.
  * Exists because Spark's higher-order functions don't participate in
  * whole-stage codegen and pay a lambda-variable binding per ELEMENT
  * (round 20, guide §4 — the same reason graft_dot replaced
  * aggregate(zip_with) in round 19); shingling is the dominant map work
  * of the MinHash family (d02/d04/d06/d07/p01/p02) and the
  * decontamination scan (t07).
  *
  * Token arrays shorter than n yield an EMPTY array — the only
  * divergence from the HOF form, whose `sequence(1, 0)` would emit a
  * descending index range and fault on `element_at(t, 0)` under ANSI;
  * every call site either filters `size >= n` first or wraps the HOF in
  * exactly this empty-array CASE.
  *
  * concat_ws null-skipping is preserved via UTF8String.concatWs (no
  * call site can produce null tokens today).
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires an array<string> argument, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(c: Expression): Shingles =
    copy(child = c)

  override def prettyName: String = "graft_shingles"
}
