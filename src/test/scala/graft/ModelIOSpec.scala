package graft

import graft.functions.{Curation, ModelIO, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-model plug-in seam: parquet round-trips for merge tables and
  * class-evidence lexicons, and the lexicon scoring semantics
  * (distinct-per-doc training, add-one smoothing, OOV prior).
  */
class ModelIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("merge table round-trips ordered; loaded merges encode identically") {
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "new newer newest"),
      (3L, "low low new new lower newer")
    ).toDF("doc_id", "text")
    val merges = Curation.bpeCharVocab(docs, "text", k = 6)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val path = tmp("graft_merges") + "/m"
    ModelIO.saveMerges(spark, merges, path)
    val loaded = ModelIO.loadMerges(spark, path)
    assert(loaded === merges) // order AND content
    val direct = Curation.bpeCharApplyVocab(docs, "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaDisk = Curation.bpeCharApplyVocab(docs, "text", "doc_id", loaded)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaDisk === direct)
  }

  test("buildLexicon counts document frequency (distinct per doc) by class") {
    val docs = Seq(
      (0L, "good good great"),   // pos: good counts ONCE here
      (2L, "good fine"),         // pos
      (1L, "bad good"),          // neg
      (3L, "bad awful")          // neg
    ).toDF("doc_id", "text")
    val lex = TextAnalysis.buildLexicon(docs, "text", col("doc_id") % 2 === 0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(lex("good") === ((2L, 1L))) // docs 0,2 pos; doc 1 neg
    assert(lex("bad") === ((0L, 2L)))
    assert(lex("great") === ((1L, 0L)))
  }

  test("lexiconScore: add-one sums, OOV prior, save/load round trip") {
    val train = Seq(
      (0L, "good great"),
      (1L, "bad awful")
    ).toDF("doc_id", "text")
    val lex = TextAnalysis.buildLexicon(train, "text", col("doc_id") === 0L)
    val path = tmp("graft_lex") + "/lex"
    ModelIO.saveLexicon(lex, path)
    val loaded = ModelIO.loadLexicon(spark, path)

    val cand = Seq(
      (10L, "good great"),   // 2 hits: num (1+1)+(1+1)=4, den (1+0+2)*2=6
      (11L, "bad unknown"),  // bad: (0+1)/(0+1+2); unknown: 1/2 → 1+1=2 / 3+2=5
      (12L, "zz qq")         // all OOV → 2/4 = 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexiconScore(cand, "text", "doc_id", loaded)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(10L) === ((2L, 2L, 4.0 / 6.0)))
    assert(out(11L) === ((2L, 1L, 2.0 / 5.0)))
    assert(out(12L) === ((2L, 0L, 0.5)))
  }
}
