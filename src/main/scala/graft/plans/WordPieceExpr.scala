package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Piece table for greedy WordPiece inference, pre-split into the two
  * lookup classes the matcher needs: word-INITIAL pieces (stored as
  * written) and CONTINUATION pieces (stored with their `##` prefix
  * stripped, so the matcher compares raw substrings and never
  * allocates a prefixed candidate). `maxInit`/`maxCont` bound the
  * longest-match scan so each position probes at most
  * `min(remaining, maxLen)` candidates — the standard vocabulary-trie
  * cost bound without the trie. Serializable: the object ships once
  * per task via the expression's reference array, never per row.
  */
final class WordPieceVocab(pieces: Seq[String]) extends Serializable {
  val init = new java.util.HashSet[String]()
  val cont = new java.util.HashSet[String]()
  var maxInit = 0
  var maxCont = 0
  pieces.foreach { p =>
    if (p.startsWith("##")) {
      val raw = p.substring(2)
      if (raw.nonEmpty) {
        cont.add(raw)
        if (raw.length > maxCont) maxCont = raw.length
      }
    } else if (p.nonEmpty) {
      init.add(p)
      if (p.length > maxInit) maxInit = p.length
    }
  }
}

/** Greedy longest-match-first WordPiece ENCODE of ONE word — the BERT
  * inference rule: at each position take the longest vocabulary piece
  * matching the remaining suffix (continuation positions match the
  * `##`-prefixed class); a position with no match collapses the whole
  * word to `[UNK]`. Deterministic (no ties: a piece is unique within
  * its class at a given length), loop-per-row in a single codegen-able
  * call — the per-word twin of the k-pass replace-chain encodes, and
  * the shape a 30k-piece production vocabulary needs: cost is
  * O(len · maxPieceLen) per word with zero per-row Column trees.
  *
  * Reference semantics: the greedy WordPiece tokenizer of
  * Devlin et al. 2019 (BERT) / Wu et al. 2016 (GNMT), as documented in
  * the public BERT repository's `tokenization.py` — re-derived here
  * against the published algorithm description, not ported code.
  */
case class WordPieceEncodeF(child: Expression, vocab: WordPieceVocab)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_encode requires STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    WordPieceEncodeF.encode(v.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocab,
      classOf[WordPieceVocab].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.WordPieceEncodeF.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeF =
    copy(child = newChild)
  override def prettyName: String = "graft_wordpiece_encode"
}

object WordPieceEncodeF {

  private val UNK = UTF8String.fromString("[UNK]")

  /** Static bridge the generated code calls. Operates on Java chars
    * (the corpus alphabet is ASCII; for supplementary-plane input the
    * pieces would split on surrogate halves consistently on both the
    * train and apply side, so the rule stays self-consistent).
    */
  def encode(w: UTF8String, v: WordPieceVocab): UTF8String = {
    val s = w.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    val out = new java.lang.StringBuilder(n * 2)
    var pos = 0
    while (pos < n) {
      val set = if (pos == 0) v.init else v.cont
      val maxLen = if (pos == 0) v.maxInit else v.maxCont
      var end = math.min(n, pos + maxLen)
      var found = -1
      while (end > pos && found < 0) {
        if (set.contains(s.substring(pos, end))) found = end
        else end -= 1
      }
      if (found < 0) return UNK
      if (pos > 0) { out.append(' '); out.append("##") }
      out.append(s, pos, found)
      pos = found
    }
    UTF8String.fromString(out.toString)
  }

  def wordpieceEncode(c: Column, vocab: WordPieceVocab): Column =
    org.apache.spark.sql.GraftBridge.column(
      WordPieceEncodeF(org.apache.spark.sql.GraftBridge.expression(c), vocab))
}
