package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Expression.
  *
  * Canonical composition is step zero of any serious text-dedup
  * pipeline: "é" as U+00E9 and as U+0065 U+0301 are the same text but
  * different bytes, so every byte-level fingerprint (tx4), shingle hash
  * (dd2/dd14) and exact-dedup key (dd1) silently treats them as
  * distinct documents unless the corpus is normalized first. Spark has
  * no built-in for it; this wraps `java.text.Normalizer` (the JDK's
  * implementation of UAX #15) behind a static helper that both `eval`
  * and the generated code call.
  *
  * Oracle contract: DuckDB's `nfc_normalize` (utf8proc) implements the
  * same Unicode standard, so results are byte-identical across engines
  * — the same one-standard-two-implementations argument as the md5
  * contract behind [[Hash60]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and ~all real
    // corpus text is already NFC — skip the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
