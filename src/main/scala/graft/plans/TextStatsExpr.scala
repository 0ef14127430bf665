package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics: one scan of the string computes every
  * counter that [[graft.functions.TextAnalysis]] derives from ~6 separate
  * regex/split passes. Returns a struct; ratios are derived as cheap
  * column arithmetic on top.
  *
  * Semantics mirror the TextAnalysis expressions exactly (ASCII domain):
  *  - tokens: maximal runs of non-whitespace in the trimmed string
  *    (`split(trim(c), "\\s+")`); zero for blank input
  *  - bpe-ish: letter runs count 1, each digit 1, each other
  *    non-whitespace-non-alphanumeric char 1
  *    (`[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]`)
  *  - punct: membership in `.,;:!?'"()[]-`
  *  - stopword hits: whitespace tokens ∈ TextAnalysis.EnglishStopwords
  * Equality with the builtin-HOF formulations is asserted per-row over the
  * fixture corpus in TextStatsExprSpec.
  */
case class TextStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.Schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_text_stats requires a STRING column, got ${other.sql}")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("textstats", this, classOf[TextStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): InternalRow =
    nullSafeEval(s).asInstanceOf[InternalRow]

  @transient private lazy val stopwords: Set[String] =
    graft.functions.TextAnalysis.EnglishStopwords.toSet

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
  private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
         '[' | ']' | '-' => true
    case _ => false
  }
  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var charLen = 0L // code points... length() matches Spark's length (code points for UTF8String? chars here; fixture is ASCII)
    var nPunct = 0L
    var nDigit = 0L
    var nBpe = 0L
    var inLetterRun = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isPunct(c)) nPunct += 1
      if (isDigit(c)) nDigit += 1
      if (isLetter(c)) {
        if (!inLetterRun) { nBpe += 1; inLetterRun = true }
      } else {
        inLetterRun = false
        if (isDigit(c)) nBpe += 1
        else if (!isWs(c)) nBpe += 1
      }
      i += 1
    }
    charLen = n.toLong

    // Whitespace tokens over the trimmed string — faithful to the HOF/
    // oracle form `split(trim(c), "\s+")`: trim strips SPACES ONLY, and
    // regex split keeps empty leading/trailing segments (a string
    // bounded by non-space whitespace yields empty tokens that count).
    // Token count = whitespace runs + 1; empty segments add 0 length and
    // are never stopwords.
    var nTok = 0L
    var nStop = 0L
    var tokLenSum = 0L
    var start = 0
    var end = n
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (end > start) {
      var wsRuns = 0L
      var inWs = false
      var j = start
      var tokStart = -1
      while (j <= end) {
        val atWs = j < end && isWs(s.charAt(j))
        if (atWs && !inWs) wsRuns += 1
        inWs = atWs
        if (!atWs && j < end && tokStart < 0) tokStart = j
        if ((atWs || j == end) && tokStart >= 0) {
          tokLenSum += (j - tokStart)
          if (stopwords.contains(s.substring(tokStart, j))) nStop += 1
          tokStart = -1
        }
        j += 1
      }
      nTok = wsRuns + 1
    }

    InternalRow(nTok, nBpe, charLen, nPunct, nDigit, nStop, tokLenSum)
  }

  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(child = c)
  override def prettyName: String = "graft_text_stats"
}

object TextStatsExpr {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_bpeish", LongType, nullable = false),
    StructField("char_len", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false)))

  def textStats(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TextStatsExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}
