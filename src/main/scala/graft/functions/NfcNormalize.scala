package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every web-crawl cleaning pipeline runs
  * before hashing or tokenizing text (decomposed `e` + U+0301 and
  * precomposed `é` must fingerprint identically, or exact dedup
  * silently misses byte-different/codepoint-equal duplicates).
  *
  * Spark ships no normalization function, and a Scala UDF would break
  * whole-stage codegen in the scan projection where cleaning runs; this
  * is the md5hash64 pattern — a UnaryExpression whose generated code
  * calls one static JVM helper (`java.text.Normalizer`, the ICU-aligned
  * JDK implementation of UAX #15). Cross-engine parity: DuckDB's
  * `nfc_normalize` implements the same Unicode algorithm, so cleaned
  * text hash-matches (q165).
  *
  * The common case — already-NFC ASCII/Latin text, virtually all of a
  * real crawl — is a single `Normalizer.isNormalized` scan with zero
  * allocation; only rows that actually decompose pay the compose pass.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc expects a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
