package graft

import graft.functions.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs, hand-computable counts: "fox" in 2 docs, "the" in all 4,
  // "cat" in 1; dl = 3,4,3,2 → avgdl = 3.0
  private def corpus = Seq(
    (1L, "the quick fox"),
    (2L, "the lazy fox fox"),
    (3L, "the sleepy cat"),
    (4L, "the den")
  ).toDF("doc_id", "text")

  private def q(terms: String*) =
    terms.map(t => (100L, t)).toDF("query_id", "term")

  test("postings carry tf and dl; termStats df/cf are exact") {
    val p = Retrieval.buildPostings(corpus, "text", "doc_id")
    val byKey = p.collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Int]("dl"))).toMap
    assert(byKey(("fox", 2L)) === ((2L, 4)))
    assert(byKey(("the", 4L)) === ((1L, 2)))
    val stats = Retrieval.termStats(p).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("cf"))).toMap
    assert(stats("fox") === ((2L, 3L)))   // docs 1,2; tf 1+2
    assert(stats("the") === ((4L, 4L)))
    assert(stats("cat") === ((1L, 1L)))
  }

  test("bm25 score matches the hand-computed formula") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id", q("fox"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    val k1 = 1.2; val b = 0.75
    def expected(tf: Double, dl: Double): Double =
      math.sqrt((4.0 - 2.0 + 0.5) / (2.0 + 0.5)) *
        ((tf * (k1 + 1.0)) / (tf + (k1 * ((1.0 - b) + (b * (dl / 3.0))))))
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._2 === expected(1.0, 3.0))
    assert(out(2L)._2 === expected(2.0, 4.0))
    // doc 2: tf=2 outweighs its length penalty here → rank 1
    assert(out(2L)._1 === 1 && out(1L)._1 === 2)
  }

  test("maxDfPermille drops stop terms on the index side") {
    // "the" has df=4=N → kept at 1000, dropped at 999
    val kept = Retrieval.bm25TopK(corpus, "text", "doc_id", q("the"), k = 10)
    assert(kept.count() === 4)
    val cut = Retrieval.bm25TopK(corpus, "text", "doc_id", q("the"), k = 10,
      maxDfPermille = 999)
    assert(cut.count() === 0)
  }

  test("multi-term scores are the term-ordered fold and rank ties break by id") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
      q("fox", "cat", "the"), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"))).toMap
    // every doc matches "the"; doc 3 adds cat, docs 1-2 add fox
    assert(out.size === 4)
    // fold = ((0 + c_first) + c_next): for doc 1 terms sort fox < the
    val k1 = 1.2; val b = 0.75
    def c(tf: Double, dl: Double, df: Double): Double =
      math.sqrt((4.0 - df + 0.5) / (df + 0.5)) *
        ((tf * (k1 + 1.0)) / (tf + (k1 * ((1.0 - b) + (b * (dl / 3.0))))))
    assert(out(1L)._2 === 0.0 + c(1, 3, 2) + c(1, 3, 4))
    assert(out(3L)._2 === 0.0 + c(1, 3, 1) + c(1, 3, 4))
  }

  test("scores are bit-identical across partitionings") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} tok${i % 13} filler$i")).toDF("doc_id", "text")
    val qt = Seq((1L, "tok3"), (1L, "tok5"), (2L, "tok1")).toDF("query_id", "term")
    def run(parts: Int) =
      Retrieval.bm25TopK(docs.repartition(parts), "text", "doc_id", qt, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).sortBy(x => (x._1, x._3))
    assert(run(1).toSeq === run(13).toSeq)
  }

  test("phrase matches find every occurrence, 1-based, full votes only") {
    val docs = Seq(
      (1L, "a b c a b c a b"),   // "a b c" at 1 and 4; "a b" also at 7
      (2L, "a c b a b"),         // "a b" at 4 only
      (3L, "b c b c")            // no "a"
    ).toDF("doc_id", "text")
    val phrase3 = Seq((9L, 0, "a"), (9L, 1, "b"), (9L, 2, "c"))
      .toDF("query_id", "qpos", "term")
    val m3 = Retrieval.phraseMatches(docs, "text", "doc_id", phrase3)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(m3 === Set((1L, 1), (1L, 4)))
    val phrase2 = Seq((9L, 0, "a"), (9L, 1, "b"))
      .toDF("query_id", "qpos", "term")
    val m2 = Retrieval.phraseMatches(docs, "text", "doc_id", phrase2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(m2 === Set((1L, 1), (1L, 4), (1L, 7), (2L, 4)))
  }

  test("phrase with a repeated term needs every position aligned") {
    val docs = Seq((1L, "x a a x"), (2L, "a x a")).toDF("doc_id", "text")
    val phrase = Seq((5L, 0, "a"), (5L, 1, "a"))
      .toDF("query_id", "qpos", "term")
    val m = Retrieval.phraseMatches(docs, "text", "doc_id", phrase)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(m === Set((1L, 2))) // doc 2's "a x a" never has adjacent a a
  }

  test("proximity counts every |px-py| <= w pair and keeps min distance") {
    val docs = Seq(
      (1L, "a x x b x a"),   // a@1,6 b@4: pairs |1-4|=3, |6-4|=2 → 2 pairs, min 2
      (2L, "a x x x x x b"), // |1-7|=6 > 4 → no match
      (3L, "b a")            // |2-1|=1 → 1 pair, min 1
    ).toDF("doc_id", "text")
    val pairs = Seq((9L, "a", "b")).toDF("query_id", "x", "y")
    val got = Retrieval.proximityMatches(docs, "text", "doc_id", pairs, w = 4)
      .collect().map(r => r.getLong(1) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Int]("min_dist"))).toMap
    assert(got === Map(1L -> ((2L, 2)), 3L -> ((1L, 1))))
  }

  test("appended postings score bit-identically to a from-scratch build") {
    val docs = (0L until 120L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} tok${i % 13} extra${i % 3}"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_retr_ing").toString
    Retrieval.buildPostings(docs.where(col("doc_id") < 40), "text", "doc_id")
      .write.mode("overwrite").parquet(s"$tmp/idx")
    Retrieval.appendPostings(docs.where(col("doc_id") >= 40 &&
      col("doc_id") < 90), "text", "doc_id", s"$tmp/idx")
    Retrieval.appendPostings(docs.where(col("doc_id") >= 90), "text",
      "doc_id", s"$tmp/idx")
    val qt = Seq((1L, "tok3"), (1L, "tok5"), (2L, "extra1"))
      .toDF("query_id", "term")
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .sortBy(x => (x._1, x._3)).toSeq
    val ingested = bits(Retrieval.bm25TopKFromPostings(
      spark.read.parquet(s"$tmp/idx"), qt, k = 10))
    val rebuilt = bits(Retrieval.bm25TopK(docs, "text", "doc_id", qt, k = 10))
    assert(ingested === rebuilt)
    assert(ingested.nonEmpty)
  }

  test("pre-scored index probe ranks bit-identically to the batch path") {
    val docs = (0L until 150L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} tok${i % 13} pad${i % 4}"))
      .toDF("doc_id", "text")
    val qt = Seq((1L, "tok3"), (1L, "tok5"), (2L, "pad1"), (2L, "tok8"))
      .toDF("query_id", "term")
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .sortBy(x => (x._1, x._3)).toSeq
    val batch = bits(Retrieval.bm25TopK(docs, "text", "doc_id", qt, k = 10))
    val static = Retrieval.bm25IndexScored(
      Retrieval.buildPostings(docs, "text", "doc_id"))
    val probed = bits(Retrieval.bm25RankContributions(
      qt.join(static, "term"), qt, k = 10))
    assert(probed === batch)
    assert(batch.nonEmpty)
  }

  test("rrf fusion: both-list docs beat single-list docs at equal rank") {
    // query 1: doc 10 ranked 1 by BOTH lists; doc 20 ranked 2 lexically
    // only; doc 30 ranked 2 vector-only
    val lex = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 10L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, k = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("lex_rank"),
        r.getAs[Int]("vec_rank"), r.getAs[Long]("rrf"), r.getAs[Int]("rank")))
      .toSeq
    val c1 = 1000000000L / 61 // rank-1 contribution
    val c2 = 1000000000L / 62
    // doc 10 fused from both lists; 20 vs 30 tie on score, doc id breaks
    assert(got === Seq(
      (10L, 1, 1, 2 * c1, 1),
      (20L, 2, 0, c2, 2),
      (30L, 0, 2, c2, 3)))
  }

  test("plan broadcasts only the query side, never corpus-sized inputs") {
    val plan = Retrieval.bm25TopK(corpus, "text", "doc_id", q("fox"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    // the corpus-side aggregations stay as exchanges, not broadcasts
    assert(plan.contains("Exchange"))
  }
}
