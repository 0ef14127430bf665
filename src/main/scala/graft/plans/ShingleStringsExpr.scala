package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a token array as STRINGS, one fused pass.
  * The HOF form (`transform(sequence(...), i -> concat_ws(slice(...)))`
  * + `array_distinct`) interprets a lambda and allocates a slice per
  * shingle per row — measured as the dominant cost of the corpus-wide
  * n-gram frequency scan. Same construction as the DuckDB oracle: for
  * n tokens, shingles start at 1..max(n−k+1, 1), each joining up to k
  * tokens with a single space (short docs yield their whole text as one
  * shingle); first-occurrence order, duplicates dropped.
  */
case class ShingleStringsF(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    ShingleStringsF.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleStringsF.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStringsF =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_strings"
}

object ShingleStringsF {

  private val Space = UTF8String.fromString(" ")

  /** Static bridge the generated code calls. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val count = math.max(n - (k - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val take = math.min(k, n - i)
      val parts = new Array[UTF8String](take)
      var j = 0
      while (j < take) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def shingleStrings(tokens: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ShingleStringsF(org.apache.spark.sql.GraftBridge.expression(tokens), k))
}

/** Distinct CHARACTER bigrams of a string, one fused pass — the
  * char-level sibling of [[ShingleStringsF]], feeding
  * [[graft.functions.TextAnalysis.bigramNovelty]]. Exactly equivalent
  * to `array_distinct(transform(sequence(1, length(t) - 1),
  * i -> substr(t, i, 2)))` (bit-equality spec incl. multi-byte text):
  * a "character" is a Unicode CODE POINT, as in Spark's `substring`,
  * bigrams are adjacent code-point pairs in first-occurrence order,
  * duplicates dropped, and strings shorter than 2 code points yield an
  * empty array (callers guard `length >= 2`; the HOF form must NOT be
  * evaluated there because `sequence(1, 0)` descends). The HOF form
  * allocates one interpreted-lambda frame + substring scan per
  * position; this walks the UTF-8 bytes once.
  */
case class DistinctCharBigramsF(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    DistinctCharBigramsF.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.DistinctCharBigramsF.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DistinctCharBigramsF =
    copy(child = newChild)
  override def prettyName: String = "graft_distinct_char_bigrams"
}

object DistinctCharBigramsF {

  /** Static bridge the generated code calls. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // code-point start offsets (one pass over the bytes)
    var starts = new Array[Int](math.min(n, 16) + 1)
    var count = 0
    var off = 0
    while (off < n) {
      if (count == starts.length - 1) {
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      }
      starts(count) = off
      count += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    starts(count) = n
    if (count < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count - 1) {
      seen.add(UTF8String.fromBytes(bytes, starts(i), starts(i + 2) - starts(i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def distinctCharBigrams(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DistinctCharBigramsF(org.apache.spark.sql.GraftBridge.expression(c)))
}
