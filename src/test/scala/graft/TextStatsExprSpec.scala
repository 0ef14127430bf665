package graft

import graft.functions.TextAnalysis
import graft.plans.TextStatsExpr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-row equality of the single-pass native text-stats expression with
  * the builtin-HOF formulations, over the full fixture corpus plus edge
  * strings.
  */
class TextStatsExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val t = col("text")
    val rows = df.select(
      TextStatsExpr.textStats(t).as("s"),
      TextAnalysis.tokenCount(t).cast("long").as("e_tok"),
      TextAnalysis.bpeishTokenCount(t).cast("long").as("e_bpe"),
      length(t).cast("long").as("e_len"),
      length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]-]", "")).cast("long").as("e_punct"),
      length(regexp_replace(t, "[^0-9]", "")).cast("long").as("e_digit"),
      size(filter(TextAnalysis.tokens(t),
        x => x.isin(TextAnalysis.EnglishStopwords.map(lit(_)): _*))).cast("long").as("e_stop"),
      aggregate(transform(TextAnalysis.tokens(t), x => length(x).cast("long")),
        lit(0L), (a, x) => a + x).as("e_tls")).collect()
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getLong(0) === r.getLong(1), "n_tokens")
      assert(s.getLong(1) === r.getLong(2), "n_bpeish")
      assert(s.getLong(2) === r.getLong(3), "char_len")
      assert(s.getLong(3) === r.getLong(4), "n_punct")
      assert(s.getLong(4) === r.getLong(5), "n_digit")
      assert(s.getLong(5) === r.getLong(6), "n_stop")
      assert(s.getLong(6) === r.getLong(7), "tok_len_sum")
    }
  }

  test("native text stats equal HOF formulations on the fixture corpus") {
    compare(Tables.read(spark, SparkTestSession.Sf, "documents"))
  }

  test("native text stats equal HOF formulations on edge strings") {
    compare(Seq(
      "", "   ", "a", " a ", "a1b2!", "don't stop, won't (stop)...",
      "the  and\tof\nto", "12 34-56", "[x] (y) \"z\"; 'q': !?",
      "trailing space ", "\ttab lead").toDF("text"))
  }
}
