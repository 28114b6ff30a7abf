package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(a, b)` — dot product of two numeric arrays as a SEQUENTIAL
  * left fold of double products from 0.0 (bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D,
  * (acc, v) -> acc + v)` and to DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(list_zip(a, b), ...)))`).
  *
  * Exists because Spark's higher-order functions don't participate in
  * whole-stage codegen and allocate a lambda frame per element — on the
  * similarity operators the dot product IS the hot loop. `doGenCode`
  * emits a tight primitive loop instead.
  *
  * Null semantics match the zip_with formulation: NULL input array, any
  * NULL element, or length mismatch (zip_with pads with NULL) → NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).find(e => !(e.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    })) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires numeric array arguments, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  private def getDouble(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr1 = a.asInstanceOf[ArrayData]
    val arr2 = b.asInstanceOf[ArrayData]
    val n = arr1.numElements()
    if (arr2.numElements() != n) return null
    val (t1, t2) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (arr1.isNullAt(i) || arr2.isNullAt(i)) return null
      sum += getDouble(t1, arr1, i) * getDouble(t2, arr2, i)
      i += 1
    }
    sum
  }

  private def genGetter(dt: DataType, arr: String, i: String): String = dt match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val g1 = genGetter(elemType(left), arr1, i)
      val g2 = genGetter(elemType(right), arr2, i)
      s"""
      final int $n = $arr1.numElements();
      boolean $bad = $arr2.numElements() != $n;
      double $sum = 0.0;
      if (!$bad) {
        for (int $i = 0; $i < $n; $i++) {
          if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { $bad = true; break; }
          $sum += ($g1) * ($g2);
        }
      }
      if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
