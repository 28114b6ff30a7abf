package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-reachable NFC helper (a plain object compiles to static
  * forwarders the generated Java can call). The `isNormalized` fast path
  * matters: real corpora are overwhelmingly already NFC, and skipping
  * the rebuild keeps the hot loop allocation-free for them. */
object TextNorm {
  private val NFC = java.text.Normalizer.Form.NFC
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** `graft_nfc(str)` — Unicode NFC normalization as a codegen'd Catalyst
  * expression (Spark has no built-in; a Scala UDF here would break
  * whole-stage codegen in the middle of every text-cleaning pipeline).
  * Canonical-equivalent byte representations (decomposed `e` + U+0301 vs
  * precomposed `é`) must normalize before exact/MinHash dedup or
  * fingerprinting, or visually identical documents hash apart. Null in →
  * null out; DuckDB's `nfc_normalize` is the oracle twin. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: an untyped NULL literal evaluates to null (null in →
    // null out), matching DuckDB's nfc_normalize(NULL)
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TextNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
