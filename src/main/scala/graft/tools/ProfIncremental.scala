package graft.tools

import graft.Tables
import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the incremental cross-corpus dedup path: times
  * index build, the band join + exactly-once filter (candidates only, no
  * verify), and the full verified query separately so the optimization
  * target is measured, not guessed (SCALING.md workflow).
  * Usage: `tools/run.sh graft.tools.ProfIncremental <sfDir>`.
  */
object ProfIncremental {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.read(spark, dir, "documents")
    val corpus = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val incoming = docs.where(pmod(col("doc_id"), lit(2)) === 1)

    val index = Dedup.minhashBandIndex(corpus, "text", "doc_id",
      k = 3, nPerm = 64, bands = 16, threshold = 0.5)
    time("index build (materialize)")(
      index.write.format("noop").mode("overwrite").save())

    val cachedIndex = index.cache()
    time("index cache")(cachedIndex.count())

    // candidate pipeline WITHOUT the jaccard verify: band, join, filter
    val inn = incoming.select(col("doc_id").cast("long").as("id_new"),
        Dedup.shingleHashes(col("text"), 3).as("sh_n"))
      .select(col("id_new"), col("sh_n"),
        Dedup.lshBandKeys(
          Dedup.minhashSignature(col("sh_n"), 64, 42L), 64, 16).as("__bn"))
      .select(col("id_new"), col("sh_n"), col("__bn"),
        explode(col("__bn")).as("band"))
    time("incoming banding only")(
      inn.select("id_new", "band").write.format("noop").mode("overwrite").save())

    val firstShared = get(org.apache.spark.sql.functions.filter(
      zip_with(col("__bn"), col("bands_c"), (x, y) => when(x === y, x)),
      e => e.isNotNull), lit(0))
    val cand = inn.join(cachedIndex, "band")
      .where(col("id_new") =!= col("id_c"))
      .where(col("band") === firstShared)
    time("join+filter (no jaccard)")(
      System.err.println("[prof] candidate rows = " +
        cand.select("id_c", "id_new").count()))

    val full = Dedup.crossCorpusDupPairs(cachedIndex, incoming,
      "text", "doc_id", k = 3, nPerm = 64, bands = 16, threshold = 0.5)
    time("full verified query")(
      full.write.format("noop").mode("overwrite").save())
    cachedIndex.unpersist()
  }
}
