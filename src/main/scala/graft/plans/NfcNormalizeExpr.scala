package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition) as a native expression — Spark ships no normalizer
  * builtin, and a Scala UDF would box/unbox every row and block
  * whole-stage codegen around it. The codegen body is one static call
  * (the JDK normalizer is the loop; there is nothing to fuse), so the
  * surrounding projection stays inside the codegen span.
  *
  * NFC is the normalization a text pipeline wants BEFORE hashing or
  * deduplicating: visually identical strings with different
  * composed/decomposed encodings (é vs e+U+0301) hash differently and
  * defeat exact dedup unless canonicalized first.
  */
case class NfcNormalizeF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalizeF.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalizeF.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeF =
    copy(child = newChild)
  override def prettyName: String = "graft_nfc_normalize"
}

object NfcNormalizeF {
  /** Static bridge the generated code calls. Skips the (allocating)
    * normalize pass when the text is already NFC — the overwhelmingly
    * common case for real corpora.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalizeF(org.apache.spark.sql.GraftBridge.expression(c)))
}
