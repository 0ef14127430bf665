package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingling and language-scoring expressions.
  *
  * [[WordShingleHashes]] exploits the fact that after whitespace
  * normalization (`regexp_replace(lower(trim(c)), "\s+", " ")`) every word
  * k-shingle is a CONTIGUOUS BYTE RANGE of the document string: shingle i
  * spans from the start of token i to the end of token i+k−1, and the
  * single-space joins are already in place. So instead of the builtin-HOF
  * pipeline (split → slice → concat_ws per position → xxhash64 — an
  * allocation per token per position), one scan finds the space positions
  * and one XXH64 call per position hashes the byte range in place, giving
  * values identical to `xxhash64(concat_ws(" ", slice(tokens, i, k)))`.
  *
  * Reference behavior being accelerated: the near-dup/shingling surface of
  * a training-data pipeline (SURVEY §7.2 step 8); Spark-side equality with
  * the HOF formulation is asserted per-row in DedupSpec.
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // analysis-time type error instead of an executor ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_hashes requires a STRING column, got ${other.sql}")
    }

  // static-dispatch codegen: `k` is a plan-time constant, so the
  // generated code calls the companion's static forwarder with it inlined
  // as a literal — no reference-object load, no per-row virtual call, and
  // the monomorphic static callsite JIT-inlines into the surrounding
  // whole-stage span
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingleHashes.hash($c, $k);")

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    WordShingleHashes.hash(s, k)

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.hash(input.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(c: Expression): WordShingleHashes =
    copy(child = c)
  override def prettyName: String = "graft_word_shingle_hashes"
}

object WordShingleHashes {
  /** The whole shingle-hash pass as a static method so generated code
    * dispatches without an instance (called from both eval paths and the
    * codegen template above — one body, no drift).
    */
  def hash(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes

    // Space positions → token boundaries. The input is single-space
    // normalized, so a 0x20 byte IS a token separator (UTF-8 multibyte
    // sequences never contain 0x20).
    var nSpaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) nSpaces += 1
      i += 1
    }
    val spaces = new Array[Int](nSpaces)
    var j = 0
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { spaces(j) = i; j += 1 }
      i += 1
    }
    val nTok = nSpaces + 1
    val nShingle = math.max(nTok - k + 1, 1)

    // distinct hashes, first-occurrence order (array_distinct semantics)
    val out = new Array[Long](nShingle)
    var nOut = 0
    val cap = Integer.highestOneBit(math.max(nShingle * 4 - 1, 4)) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1

    var p = 0
    while (p < nShingle) {
      val startByte = if (p == 0) 0 else spaces(p - 1) + 1
      val lastTok = math.min(p + k - 1, nTok - 1)
      val endByte = if (lastTok == nTok - 1) n else spaces(lastTok)
      val h = XXH64.hashUnsafeBytes(base, off + startByte, endByte - startByte, 42L)
      var slot = (java.lang.Long.hashCode(h) & 0x7fffffff) & mask
      var seen = false
      var probing = true
      while (probing) {
        if (!used(slot)) probing = false
        else if (table(slot) == h) { seen = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!seen) {
        used(slot) = true
        table(slot) = h
        out(nOut) = h
        nOut += 1
      }
      p += 1
    }
    new GenericArrayData(if (nOut == out.length) out else out.take(nOut))
  }
}

/** POSITIONAL word-shingle hashes: element `i` (0-based) is the xxhash64
  * of the k-token window starting at token `i` of the normalized string —
  * NO dedup, array length `max(nTok−k+1, 1)`. Same contiguous-byte-range
  * trick as [[WordShingleHashes]] (one scan for space positions, one XXH64
  * per window, zero allocation per position); values are identical to
  * `transform(sequence(1, n−k+1), i => xxhash64(concat_ws(" ",
  * slice(tokens, i, k))))` (asserted in DedupSpec).
  *
  * This is the candidate-generation pass of ExactSubstr-style duplicate-
  * span detection ([[graft.functions.Dedup.duplicateSpans]]): every token
  * position contributes a window key, so the corpus shuffles 8-byte
  * hashes — O(n) per document instead of the HOF form's O(n·k) string
  * re-materialization.
  */
case class WordShingleHashesAll(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_hashes_all requires a STRING column, got ${other.sql}")
    }

  // static-dispatch codegen — see WordShingleHashes
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingleHashesAll.hash($c, $k);")

  override def nullSafeEval(input: Any): Any =
    WordShingleHashesAll.hash(input.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(c: Expression): WordShingleHashesAll =
    copy(child = c)
  override def prettyName: String = "graft_word_shingle_hashes_all"
}

object WordShingleHashesAll {
  def hash(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes

    var nSpaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) nSpaces += 1
      i += 1
    }
    val spaces = new Array[Int](nSpaces)
    var j = 0
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { spaces(j) = i; j += 1 }
      i += 1
    }
    val nTok = nSpaces + 1
    val nShingle = math.max(nTok - k + 1, 1)

    val out = new Array[Long](nShingle)
    var p = 0
    while (p < nShingle) {
      val startByte = if (p == 0) 0 else spaces(p - 1) + 1
      val lastTok = math.min(p + k - 1, nTok - 1)
      val endByte = if (lastTok == nTok - 1) n else spaces(lastTok)
      out(p) = XXH64.hashUnsafeBytes(base, off + startByte, endByte - startByte, 42L)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-language marker-hit counts in one tokenization pass: returns
  * `array<int>` of marker-word hits per language, in
  * [[graft.functions.TextAnalysis.LangMarkers]] order. Token semantics
  * mirror `split(trim(c), "\s+")` (trim strips spaces only; tokens are
  * maximal non-whitespace runs) so the result equals the builtin-HOF
  * `size(filter(tokens(c), isin(markers)))` per language — asserted in
  * TextAnalysisSpec.
  */
case class LangScores(child: Expression)
    extends UnaryExpression {

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("langscores", this, classOf[LangScores].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    nullSafeEval(s).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]

  // token → bitmask of languages containing it (a token may mark several)
  @transient private lazy val tokenToLangs: Map[String, Int] = {
    val m = scala.collection.mutable.Map.empty[String, Int]
    graft.functions.TextAnalysis.LangMarkers.zipWithIndex.foreach {
      case ((_, toks), li) =>
        toks.foreach(t => m(t) = m.getOrElse(t, 0) | (1 << li))
    }
    m.toMap
  }
  @transient private lazy val nLangs: Int =
    graft.functions.TextAnalysis.LangMarkers.length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lang_scores requires a STRING column, got ${other.sql}")
    }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](nLangs)
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    var i = start
    var tokStart = -1
    while (i <= end) {
      val atWs = i < end && isWs(s.charAt(i))
      if (!atWs && i < end && tokStart < 0) tokStart = i
      if ((atWs || i == end) && tokStart >= 0) {
        tokenToLangs.get(s.substring(tokStart, i)).foreach { bits =>
          var li = 0
          while (li < nLangs) {
            if ((bits & (1 << li)) != 0) counts(li) += 1
            li += 1
          }
        }
        tokStart = -1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): LangScores =
    copy(child = c)
  override def prettyName: String = "graft_lang_scores"
}

object ShingleExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Distinct xxhash64 values of the word k-shingles of an
    * already-normalized (single-space, lowercased, trimmed) string.
    */
  def wordShingleHashes(normText: Column, k: Int): Column =
    GraftBridge.column(WordShingleHashes(GraftBridge.expression(normText), k))

  /** Positional (non-distinct) window hashes of an already-normalized
    * string: element i = hash of the k-token window starting at token i.
    */
  def wordShingleHashesAll(normText: Column, k: Int): Column =
    GraftBridge.column(WordShingleHashesAll(GraftBridge.expression(normText), k))

  /** Marker-hit counts per language (LangMarkers order) of raw text. */
  def langScores(c: Column): Column =
    GraftBridge.column(LangScores(GraftBridge.expression(c)))
}
