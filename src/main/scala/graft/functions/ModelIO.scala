package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence seam for trained text models — the plug-in point where a
  * REAL tokenizer merge list (GPT-2/SentencePiece-style ranked pairs) or
  * a real classifier lexicon, trained elsewhere, enters the same Spark
  * plans the in-repo induction feeds ([[Curation.bpeCharApplyVocab]],
  * [[TextAnalysis.lexiconScore]]). Everything is plain parquet: a model
  * produced by any engine that can write (rank, left, right) or
  * (token, n_pos, n_neg) rows plugs in unchanged.
  *
  * Scale note: merge tables are driver-sized BY DESIGN (10⁴-10⁵ rows —
  * they feed a driver-built fold/broadcast in the apply plans), so
  * `loadMerges` collecting is the intended shape, not a data-sized
  * collect. Lexicons stay DataFrames end-to-end and broadcast at apply.
  */
object ModelIO {

  /** Persist an ordered merge list as (rank, left, right) parquet. */
  def saveMerges(spark: SparkSession, merges: Seq[(String, String)],
                 path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1) // driver-sized by contract — one file, ordered read
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge list back in rank order. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"))
      .orderBy("rank")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Persist a class-evidence lexicon (token, n_pos, n_neg). */
  def saveLexicon(lex: DataFrame, path: String): Unit =
    lex.select(col("token"),
        col("n_pos").cast("long"), col("n_neg").cast("long"))
      .write.mode("overwrite").parquet(path)

  /** Load a lexicon with the schema [[TextAnalysis.lexiconScore]] expects. */
  def loadLexicon(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("token"),
        col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"))

  /** Persist bigram-LM counts ([[TextAnalysis.buildBigramLm]]) — three
    * parquet tables (contexts, bigrams, vocab): train once on the
    * reference corpus, score any later batch without re-counting.
    */
  def saveBigramLm(lm: TextAnalysis.BigramLm, path: String): Unit = {
    lm.contexts.select(col("w1"), col("c1").cast("long"))
      .write.mode("overwrite").parquet(s"$path/contexts")
    lm.bigrams.select(col("w1"), col("w2"), col("c2").cast("long"))
      .write.mode("overwrite").parquet(s"$path/bigrams")
    lm.vocab.select(col("vsize").cast("long"), col("one").cast("int"))
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load bigram-LM counts with the schema [[TextAnalysis.lmScore]]
    * expects.
    */
  def loadBigramLm(spark: SparkSession, path: String): TextAnalysis.BigramLm =
    TextAnalysis.BigramLm(
      spark.read.parquet(s"$path/contexts")
        .select(col("w1"), col("c1").cast("long").as("c1")),
      spark.read.parquet(s"$path/bigrams")
        .select(col("w1"), col("w2"), col("c2").cast("long").as("c2")),
      spark.read.parquet(s"$path/vocab")
        .select(col("vsize").cast("long").as("vsize"),
          col("one").cast("int").as("one")))
}
