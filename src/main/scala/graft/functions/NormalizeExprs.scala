package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization for the text-curation plane — the first transform
 * a multilingual training pipeline applies (mixed crawls carry the same
 * grapheme in composed and decomposed forms, and Japanese text mixes
 * full-width/half-width variants; unnormalized text splits dedup hashes,
 * n-gram decontamination, and tokenizer vocab entries for byte-different
 * spellings of identical content).
 *
 *  - NFC: canonical composition — the web-standard storage form, and the
 *    form DuckDB's `nfc_normalize` implements, so the q59 oracle pins the
 *    exact transform cross-engine.
 *  - NFKC: compatibility composition — additionally folds full-width
 *    ASCII, half-width katakana, circled digits etc. into their plain
 *    forms (the usual pre-tokenization choice for Japanese corpora; no
 *    DuckDB twin, golden-tested instead).
 *
 * Shape: a native UnaryExpression over `java.text.Normalizer` (JDK ICU
 * data) with a static-call codegen — stays inside whole-stage codegen,
 * no UDF serialization. The already-normalized fast path (isNormalized
 * is a scan without allocation) returns the input UTF8String untouched,
 * which is the common case on clean corpora.
 */
object NormalizeImpl {
  private def norm(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val t = s.toString
    if (java.text.Normalizer.isNormalized(t, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(t, form))
  }
  def nfc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = norm(s, java.text.Normalizer.Form.NFKC)
}

case class UnicodeNormalizeExpr(child: Expression, compat: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (compat) "nfkc_normalize" else "nfc_normalize"
  private def method: String = if (compat) "nfkc" else "nfc"
  protected override def nullSafeEval(input: Any): Any =
    if (compat) NormalizeImpl.nfkc(input.asInstanceOf[UTF8String])
    else NormalizeImpl.nfc(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeImpl.$method($c)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object NormalizeFns {
  /** Canonical composition (matches DuckDB `nfc_normalize`). */
  def nfc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(text), compat = false))

  /** Compatibility composition (full-width→ASCII, half-width kana→kana …). */
  def nfkc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(text), compat = true))
}
