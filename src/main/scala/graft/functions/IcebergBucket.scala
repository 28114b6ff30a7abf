package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bucket(col, n)` — Iceberg's bucket[n] partition transform
  * (murmur3_x86_32 of the single-value serialization, spec Appendix B),
  * as a codegen'd expression: the writer evaluates it once per row on the
  * hot write path, and hash-partitioned fixtures repartition by it.
  *
  * Output is `(hash & Int.MaxValue) % n` ∈ [0, n). Null in → null out.
  */
case class IcebergBucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (buckets <= 0)
      TypeCheckResult.TypeCheckFailure(s"bucket count must be positive, got $buckets")
    else child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
           StringType | _: DecimalType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bucket does not support ${other.sql}")
    }

  // NB: no module-typed field here — expressions serialize to executors,
  // and a captured `IcebergTransforms.type` val is not Serializable.
  @inline private def T = graft.iceberg.IcebergTransforms

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => T.bucketLong(v.asInstanceOf[Int].toLong, buckets)
    case LongType | TimestampType | TimestampNTZType =>
      T.bucketLong(v.asInstanceOf[Long], buckets)
    case StringType => T.bucketUtf8(v.asInstanceOf[UTF8String], buckets)
    case d: DecimalType => T.bucketDecimal(v.asInstanceOf[Decimal], d.scale, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = "graft.iceberg.IcebergTransforms"
      val call = child.dataType match {
        case IntegerType | DateType => s"$helper.bucketLong((long) $c, $buckets)"
        case LongType | TimestampType | TimestampNTZType =>
          s"$helper.bucketLong($c, $buckets)"
        case StringType => s"$helper.bucketUtf8($c, $buckets)"
        case d: DecimalType => s"$helper.bucketDecimal($c, ${d.scale}, $buckets)"
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket"
}
