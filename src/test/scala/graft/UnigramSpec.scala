package graft

import graft.functions.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vocab: chars always kept, top-k multi by freq*len, costs ordered") {
    val docs = Seq((1L, "aba aba ab"), (2L, "aba b")).toDF("doc_id", "text")
    val v = Unigram.unigramVocab(docs, "text", k = 2)
      .as[(String, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    // chars: a (2·3+1·2+1 = occurrences of 'a'), b; every char present
    assert(v.contains("a") && v.contains("b"))
    assert(v("a")._3 && v("b")._3)
    // counts are substring occurrences weighted by word frequency:
    // "aba"×3 has 'a'×2, 'ab'×1(? no: positions 1,2? 'ab' at 1) …
    // spot-check the deterministic ones: 'aba' appears as a substring
    // of "aba" once per word occurrence = 3
    assert(v("aba")._2 === 3L && !v("aba")._3)
    // cost is a negative fixed-point log2 and more frequent ⇒ cheaper
    // (less negative)
    assert(v("a")._4 < 0 && v("a")._4 > v("aba")._4)
  }

  test("viterbi picks the max-likelihood split; ties break on path") {
    // vocab: chars x,y cost -30; piece "xy" cost -40: "xyxy" best as
    // xy|xy (-80) vs x|y|x|y (-120) vs xy|x|y (-100)
    val costs = Map("x" -> -30L, "y" -> -30L, "xy" -> -40L)
    val segs = Unigram.viterbiSegments(
        Seq("xyxy", "yx", "x").toDF("w"), costs)
      .as[(String, String)].collect().toMap
    assert(segs("xyxy") === "xy xy")
    assert(segs("yx") === "y x")
    assert(segs("x") === "x")
    // exact cost tie: "ab" as a|b (−20−20) vs ab (−40) → equal sums;
    // the lexicographically SMALLER path "a b" < "ab" wins
    val tie = Map("a" -> -20L, "b" -> -20L, "ab" -> -40L)
    val t = Unigram.viterbiSegments(Seq("ab").toDF("w"), tie)
      .as[(String, String)].collect().toMap
    assert(t("ab") === "a b")
  }

  test("apply: doc reassembly in word order, blanks encode empty") {
    val docs = Seq(
      (1L, "xy x"), (2L, "  "), (3L, "yx xy xy")
    ).toDF("doc_id", "text")
    val costs = Map("x" -> -30L, "y" -> -30L, "xy" -> -40L)
    val out = Unigram.unigramApply(docs, "text", "doc_id", costs)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "xy x", 2L)))
    assert(out(1) === ((2L, "", 0L)))
    assert(out(2) === ((3L, "y x xy xy", 4L)))
  }

  test("apply rejects words past the oracle's unroll bound") {
    val docs = Seq((1L, "a" * (Unigram.MaxWordLen + 1))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.unigramApply(docs, "text", "doc_id", Map("a" -> -1L))
    }
    assert(e.getMessage.contains("longer"))
  }

  test("hard-EM recount: counts equal Viterbi uses, unused pieces prune") {
    val docs = Seq((1L, "xy xy x"), (2L, "xy")).toDF("doc_id", "text")
    // 'xy' so cheap every "xy" word segments as one piece → 'y' alone
    // is never used and must prune out of the recounted vocab
    val costs = Map("x" -> -50L, "y" -> -50L, "xy" -> -10L)
    val em = Unigram.unigramEmRecount(docs, "text", costs)
      .select("piece", "cnt").as[(String, Long)].collect().toMap
    assert(em("xy") === 3L) // word "xy" count 3 across docs
    assert(em("x") === 1L)
    assert(!em.contains("y"))
  }

  test("per-row encode is bit-identical to the join form") {
    val docs = graft.Tables.read(spark, SparkTestSession.Sf, "documents")
    val costs = Unigram.costTable(Unigram.unigramVocab(docs, "text", k = 24))
    val joinForm = Unigram.unigramApply(docs, "text", "doc_id", costs)
    val perRow = Unigram.unigramApplyPerRow(docs, "text", "doc_id", costs)
    assert(joinForm.exceptAll(perRow).isEmpty)
    assert(perRow.exceptAll(joinForm).isEmpty)
  }

  test("big-vocab join path is bit-identical to the literal-map path") {
    val docs = graft.Tables.read(spark, SparkTestSession.Sf, "documents")
    val vocab = Unigram.unigramVocab(docs, "text", k = 24)
    val small = Unigram.unigramApply(docs, "text", "doc_id",
      Unigram.costTable(vocab))
    val big = Unigram.unigramApplyBig(docs, "text", "doc_id", vocab)
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty)
  }

  test("50k-piece vocab routes to the join form, same output, no map literal") {
    val docs = graft.Tables.read(spark, SparkTestSession.Sf, "documents")
    val vocab = Unigram.unigramVocab(docs, "text", k = 24)
    // pad pieces longer than MaxPieceLen can never match a candidate
    // substring, so the padded vocabulary must encode identically
    val pad = spark.range(50000).select(
      format_string("zzpadpiece%07d", col("id")).as("piece"),
      lit(-999999999L).as("cost_fp"), lit(0L).as("cnt"),
      lit(false).as("is_char"))
    val padded = vocab.unionByName(pad)
    assert(padded.count() > Unigram.LiteralMapCutover)
    val out = Unigram.unigramApplyVocab(docs, "text", "doc_id", padded)
    val ref = Unigram.unigramApply(docs, "text", "doc_id",
      Unigram.costTable(vocab))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
    // the cutover really took the join route: the vocabulary must NOT
    // appear as a plan literal (no MapType literal anywhere near 50k
    // entries), and a broadcast join must price the candidates
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.MapData
    val bigLits = out.queryExecution.analyzed.collect {
      case p => p.expressions.flatMap(_.collect {
        case Literal(m: MapData, _) if m.numElements() > 1000 => m
      })
    }.flatten
    assert(bigLits.isEmpty,
      "50k-piece vocabulary leaked into the plan as a literal map")
    assert(out.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
  }

  test("per-row encode fails loudly past the oracle's unroll bound") {
    val docs = Seq((1L, "ok " + "a" * (Unigram.MaxWordLen + 1)))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Unigram.unigramApplyPerRow(docs, "text", "doc_id", Map("a" -> -1L))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("pre-split")))
  }

  test("EM recount rejects words past the oracle's unroll bound") {
    val docs = Seq((1L, "a" * (Unigram.MaxWordLen + 1))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.unigramEmRecount(docs, "text", Map("a" -> -1L))
    }
    assert(e.getMessage.contains("longer"))
  }

  test("fixture corpus: every word segments and piece counts add up") {
    val docs = graft.Tables.read(spark, SparkTestSession.Sf, "documents")
    val vocab = Unigram.unigramVocab(docs, "text", k = 24)
    val out = Unigram.unigramApply(docs, "text", "doc_id",
      Unigram.costTable(vocab))
    // no document lost, none encodes to null
    assert(out.where(col("encoded").isNull).isEmpty)
    // token accounting: n_pieces ≥ word count (a word is ≥ 1 piece) and
    // every non-blank doc got a non-empty encoding
    val bad = out.join(docs, "doc_id")
      .where(length(trim(col("text"))) > 0 &&
        (col("n_pieces") < size(split(trim(lower(col("text"))), "\\s+")) ||
          col("encoded") === ""))
    assert(bad.isEmpty)
  }
}
