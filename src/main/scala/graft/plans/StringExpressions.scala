package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression (SURVEY.md §2 #59):
  * canonical composition unifies the byte-distinct spellings of the
  * same text (combining marks vs precomposed codepoints) BEFORE
  * dedup/hashing — without it, `café` (e + U+0301) and `café` (U+00E9)
  * hash apart and every exact/near-dup pass silently under-merges.
  *
  * Spark ships no normalize function; a UDF would break whole-stage
  * codegen on the map-only normalization pass. This is a single
  * expression whose generated code calls `java.text.Normalizer`
  * directly (ICU-grade NFC per the JDK's Unicode tables — the same
  * canonical-composition spec DuckDB's `nfc_normalize` implements,
  * which is what makes the oracle exact). The fast path: NFC-clean
  * ASCII/UTF-8 strings short-circuit inside `Normalizer.isNormalized`
  * without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.NfcNormalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
