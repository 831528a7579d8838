package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization for the text-curation pipeline.
  *
  * A multilingual corpus carries the SAME user-visible string in
  * different byte forms — 'café' composed (U+00E9) vs decomposed
  * (e + U+0301) — and every byte-keyed stage downstream (md5
  * fingerprints, minhash shingles, exact dedup, BM25 terms) treats
  * them as distinct documents. NFC canonical composition collapses
  * the forms; [[graft.operators.TextOps.normalize]] layers width
  * folding and casefold on top as the OPT-IN normalization stage.
  *
  * Shared by interpreted eval and generated code (static forwarder,
  * the [[HashUtils]] pattern). The `isNormalized` fast path matters:
  * real corpora are overwhelmingly already-NFC ASCII, and the check
  * is a scan without allocation — only the rare decomposed string
  * pays the normalize-and-reencode cost.
  */
object UnicodeNormUtils {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** NFC-normalize a string column — codegen'd, one static call per
  * row (no UDF serialization boundary, stays inside whole-stage
  * codegen). Mirrors DuckDB's `nfc_normalize` bit-for-bit: both
  * implement Unicode canonical composition, so oracled queries can
  * hash the normalized text on either engine.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    UnicodeNormUtils.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormUtils.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
