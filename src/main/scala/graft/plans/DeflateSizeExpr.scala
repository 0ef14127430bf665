package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the primitive
  * behind the Gopher-style compression-ratio quality signal (templated
  * and repetitive text compresses far better than natural prose, and
  * high-entropy garble barely compresses at all; the ratio separates all
  * three regimes with one number). Spark ships no compression scalar and
  * a Scala UDF would box rows and break the codegen span; the codegen
  * body here is one static call. Level 6 (zlib default) with the
  * standard zlib wrapper — deterministic for a given input on a given
  * JVM, which is what per-run corpus scoring needs; the byte count is a
  * SIGNAL, not a portable artifact, so the oracle passes it through and
  * value-checks everything derived from it (the q_tdigest pattern).
  */
case class DeflateSizeF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_size requires STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    DeflateSizeF.deflatedSize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeflateSizeF.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeF =
    copy(child = newChild)
  override def prettyName: String = "graft_deflate_size"
}

object DeflateSizeF {

  /** Static bridge the generated code calls: count DEFLATE output bytes
    * without materializing them (fixed scratch buffer, summed lengths).
    */
  def deflatedSize(s: UTF8String): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def deflateSize(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DeflateSizeF(org.apache.spark.sql.GraftBridge.expression(c)))
}
