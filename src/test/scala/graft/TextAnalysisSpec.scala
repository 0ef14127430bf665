package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token counting") {
    val df = Seq("the quick brown fox", "  padded  tokens  ", "", "one").toDF("t")
    val counts = df.select(TextAnalysis.tokenCount(col("t"))).as[Int].collect()
    assert(counts.toSeq === Seq(4, 2, 0, 1))
  }

  test("repetition signals: dup k-gram fractions and top-bigram fraction") {
    val df = Seq(
      (1L, "a b a b c"),  // bigrams: ab,ba,ab,bc → 4 total, 3 distinct
      (2L, "x"),          // no bigrams at all
      (3L, "w w w w"),    // bigrams: ww×3; trigrams: www×2
      (4L, "")            // empty text
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((5L, 1.0 - 3.0 / 4.0, 0.0, 2.0 / 4.0)))
    assert(out(2L) === ((1L, 0.0, 0.0, 0.0)))
    assert(out(3L) === ((4L, 1.0 - 1.0 / 3.0, 0.5, 1.0)))
    assert(out(4L) === ((0L, 0.0, 0.0, 0.0)))
  }

  test("bpe-ish token counting splits words, digits and punctuation") {
    val df = Seq("hello world", "a1b2!", "don't stop").toDF("t")
    val counts = df.select(TextAnalysis.bpeishTokenCount(col("t"))).as[Int].collect()
    // "a1b2!" → a, 1, b, 2, ! = 5 ; "don't stop" → don, ', t, stop = 4
    assert(counts.toSeq === Seq(2, 5, 4))
  }

  test("ratios") {
    val df = Seq("ab, cd!").toDF("t") // 7 chars, 2 punct, 0 digits
    val r = df.select(
      TextAnalysis.punctRatio(col("t")),
      TextAnalysis.digitRatio(col("t"))).as[(Double, Double)].head()
    assert(math.abs(r._1 - 2.0 / 7.0) < 1e-12)
    assert(r._2 === 0.0)
  }

  test("stopword ratio") {
    val df = Seq("the cat and the dog").toDF("t") // the, and, the = 3 of 5
    val r = df.select(TextAnalysis.stopwordRatio(col("t"))).as[Double].head()
    assert(math.abs(r - 0.6) < 1e-12)
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      "the cat sat on the mat and it was happy",
      "le chat est sur la table et il est content",
      "el gato está en la mesa y es feliz",
      "der Hund und die Katze sind nicht da",
      "xyzzy plugh").toDF("t")
    val langs = df.select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(langs.toSeq === Seq("en", "fr", "es", "de", "und"))
  }

  // Native one-pass LangScores/langIdNative must agree with the HOF form
  // on every fixture document plus edge cases.
  test("native langIdNative equals HOF langId") {
    val df = Seq(
      "the cat sat on the mat and it was happy",
      "le chat est sur la table et il est content",
      "el gato está en la mesa y es feliz",
      "der Hund und die Katze sind nicht da",
      "的 是 在 了 和",
      "xyzzy plugh", "", "   ", "de de la la und und" // cross-language ties
    ).toDF("t")
    val both = df.select(TextAnalysis.langId(col("t")).as("hof"),
      TextAnalysis.langIdNative(col("t")).as("native"))
    assert(both.where(col("hof") =!= col("native")).count() === 0)
    val fixture = SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bothF = fixture.select(TextAnalysis.langId(col("text")).as("hof"),
      TextAnalysis.langIdNative(col("text")).as("native"))
    assert(bothF.where(col("hof") =!= col("native")).count() === 0)
  }

  // qualityScoreFromStats must reproduce qualityScore bit-for-bit (same
  // IEEE operation order) over the fixture corpus.
  test("native quality-from-stats equals HOF qualityScore") {
    val fixture = SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"), TextAnalysis.stats(col("text")).as("s"))
    val both = fixture.select(
      TextAnalysis.qualityScore(col("text")).as("hof"),
      TextAnalysis.qualityScoreFromStats(col("s")).as("native"))
    assert(both.where(col("hof") =!= col("native")).count() === 0)
  }

  test("fingerprint is stable and perturbation-sensitive") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an utterly different document about query engines")).toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("t")))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("redactPii replaces and counts each category sequentially") {
    val df = Seq(
      (1L, "mail a.b+c@ex.co and d@sub.ex.org, host 192.168.0.1, call +1-555-0100"),
      (2L, "no pii here at all"),
      (3L, "ip 10.0.0.7 twice 10.0.0.8 and number +46-8-1234567")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "text", "doc_id")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 ===
      "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE>")
    assert((got(1L)._3, got(1L)._4, got(1L)._5) === ((2L, 1L, 1L)))
    assert(got(2L)._2 === "no pii here at all")
    assert((got(2L)._3, got(2L)._4, got(2L)._5) === ((0L, 0L, 0L)))
    assert(got(3L)._2 === "ip <IP> twice <IP> and number <PHONE>")
    assert((got(3L)._3, got(3L)._4, got(3L)._5) === ((0L, 2L, 1L)))
  }

  test("redactPii sequencing: digits inside an email are not re-counted as IP/phone") {
    // the email pattern consumes the whole address including its dotted
    // digits; after replacement nothing digit-like remains
    val df = Seq((1L, "u.10.0.0.1@ex.com")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text", "doc_id")
      .as[(Long, String, Long, Long, Long)].collect().head
    assert(r._2 === "<EMAIL>")
    assert((r._3, r._4, r._5) === ((1L, 0L, 0L)))
  }

  test("quality score is bounded and ranks clean text above noise") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it was a good day for running",
      "@@@ ### 12345 67890 !!!").toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }
}
