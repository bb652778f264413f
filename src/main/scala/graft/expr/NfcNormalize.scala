package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-
  * composition pass every text-dedup pipeline needs BEFORE hashing:
  * "é" arrives both precomposed (U+00E9) and decomposed (U+0065
  * U+0301) in real crawls, and every digest/shingle/fingerprint
  * operator in `ext/` would treat the two as different documents.
  * Spark has no built-in normalizer, so this is a custom Catalyst
  * Expression (same pattern as [[Base58Encode]]): null-safe,
  * deterministic, one static call from generated code so it stays
  * inside the WholeStageCodegen span. The fast path skips the
  * normalizer allocation entirely when the text is already NFC
  * (`Normalizer.isNormalized` — true for all-ASCII, the overwhelming
  * majority of crawl text).
  */
object Nfc {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.simpleString}")
  override def nullSafeEval(s: Any): Any =
    Nfc.normalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Nfc.normalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
