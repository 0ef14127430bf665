package graft.tools

import graft.Tables
import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the MinHash dedup path: times each phase of
  * [[Dedup.minhashDupPairs]] in isolation against a fixture dir so the
  * optimization target is measured, not guessed (SCALING.md workflow).
  * Usage: `tools/run.sh graft.tools.ProfMinhash <sfDir>`.
  */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Dedup._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.read(spark, dir, "documents")
    val n = time("scan count")(docs.count())
    System.err.println(s"[prof] docs = $n")

    val withShingles = docs.select(col("doc_id").as("id"),
      shingleHashes(col("text"), 3).as("sh"))
    time("shingles (1 pass)")(
      withShingles.write.format("noop").mode("overwrite").save())

    val sigs = withShingles.select(col("id"),
      minhashSignature(col("sh"), 64, 42L).as("sig"))
    time("signatures")(
      sigs.write.format("noop").mode("overwrite").save())

    val banded = sigs.select(col("id"),
      explode(lshBandKeys(col("sig"), 64, 16)).as("band"))
    val buckets = banded.groupBy("band")
      .agg(graft.plans.BottomKLongs.bottomK(col("id"), 1000).as("ids"))
      .where(size(col("ids")) > 1)
    val rawCandidates = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
    val nc = time("bucket + candidates")(rawCandidates.count())
    System.err.println(s"[prof] candidates = $nc")

    // bucket-size histogram: where do the candidate pairs come from?
    banded.groupBy("band").count()
      .select(when(col("count") >= 1000, 1000)
        .otherwise(pow(lit(10), floor(log10(col("count")))).cast("long"))
        .as("size_decade"))
      .groupBy("size_decade")
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy("size_decade")
      .collect()
      .foreach(r => System.err.println(
        s"[prof] bucket size ~${r.getLong(0)}: ${r.getLong(1)} buckets"))

    val shA = withShingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withShingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val verified = rawCandidates.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= 0.5)
    val nv = time("verify join (full)")(verified.count())
    System.err.println(s"[prof] verified pairs = $nv")

    time("end-to-end")(
      Dedup.minhashDupPairs(docs, "text", "doc_id", k = 3, nPerm = 64,
        bands = 16, threshold = 0.5)
        .write.format("noop").mode("overwrite").save())
    time("end-to-end sigPrefilter")(
      Dedup.minhashDupPairs(docs, "text", "doc_id", k = 3, nPerm = 64,
        bands = 16, threshold = 0.5, sigPrefilter = true)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
