package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) + lowercase as ONE native
  * codegen expression — the canonical-form step a text-dedup pipeline
  * runs before hashing ("café" composed vs decomposed, fullwidth forms,
  * case) so byte-different but canonically-equal documents collapse to
  * one key.
  *
  * Why an Expression and not a UDF: the normalize runs once per document
  * on the 100 TB scan path; a Scala UDF breaks whole-stage codegen
  * (serialization boundary per row), while this generates a direct
  * `java.text.Normalizer` call inside the span. Both `java.text
  * .Normalizer` (ICU-free JDK implementation) and DuckDB's
  * `nfc_normalize` (utf8proc) implement Unicode canonical composition,
  * so the oracle twin is `lower(nfc_normalize(x))` — same order:
  * normalize, then case-map. NFC (not NFKC) deliberately: canonical
  * equivalence only, compatibility forms (ligatures, superscripts) stay
  * distinct, and NFC is what the oracle engine exposes.
  *
  * Unicode behavior (composed==decomposed, case-fold, already-NFC
  * passthrough, non-BMP safety) is asserted in StringNormalizeSpec;
  * engine parity on corpus data is asserted by the
  * `dedup_unicode_normalized` oracle query.
  */
case class NfcCasefold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(),
         |    java.text.Normalizer.Form.NFC)
         |  .toLowerCase(java.util.Locale.ROOT));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column facade, same bridging as [[vectors]]. */
object strings {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def nfcCasefold(c: Column): Column = column(NfcCasefold(expression(c)))
}
