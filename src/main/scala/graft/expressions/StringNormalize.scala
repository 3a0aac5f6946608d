package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the curation
  * step that makes text dedup/hashing see "café" and "café" as
  * ONE string: every md5-keyed operator in this engine (exact dedup,
  * line dedup, shingles, fingerprints) hashes BYTES, so un-normalized
  * corpora silently split identical content into distinct keys.
  * Delegates to java.text.Normalizer (the JDK's ICU-conformant
  * implementation); DuckDB's `nfc_normalize` implements the same
  * Unicode algorithm, so results are bit-comparable engine-to-engine.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case _: StringType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: NFC-checking a normalized string is a cheap scan and
    // ASCII always passes — avoids re-materializing unchanged text
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
