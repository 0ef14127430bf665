package graft.tools

import graft.Tables
import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hot paths. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val docs = Tables.read(spark, sfDir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup count")(docs.count())
    time("shingles only")(noop(docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))))
    time("shingles (2nd)")(noop(docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))))
    time("sig hof 64 perms")(noop(docs.select(col("doc_id"),
      Dedup.minhashSignatureHof(Dedup.shingles(col("text"), 3), 64, 42L).as("sig"))))
    time("sig hof (2nd)")(noop(docs.select(col("doc_id"),
      Dedup.minhashSignatureHof(Dedup.shingles(col("text"), 3), 64, 42L).as("sig"))))
    time("sig native expr")(noop(docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64, 42L).as("sig"))))
    time("sig native (2nd)")(noop(docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64, 42L).as("sig"))))
    time("simhash hof")(noop(docs.select(Dedup.simhashHof(col("text")))))
    time("simhash native")(noop(docs.select(Dedup.simhash(col("text")))))
    time("full minhash pairs")(noop(
      Dedup.minhashDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.5)))
    time("full minhash (2nd)")(noop(
      Dedup.minhashDupPairs(docs, "text", "doc_id", 3, 64, 16, 0.5)))
    time("ngram jaccard")(noop(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)))
    time("ngram jaccard (2nd)")(noop(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)))
    time("jaccard prefix-filter")(noop(
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5)))
    time("jaccard prefix (2nd)")(noop(
      Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id", 3, 0.5)))
    spark.stop()
  }
}
