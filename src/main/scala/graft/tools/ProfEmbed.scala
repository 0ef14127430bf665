package graft.tools

import graft.Tables
import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the bucketed embedding-dedup path (same
  * measured-not-guessed workflow as [[ProfMinhash]]).
  * Usage: `tools/run.sh graft.tools.ProfEmbed <sfDir>`.
  */
object ProfEmbed {
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
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val emb = Tables.read(spark, dir, "embeddings")
    System.err.println(s"[prof] stats.sizeInBytes = " +
      emb.queryExecution.optimizedPlan.stats.sizeInBytes)

    val (nBands, bitsPerBand) = Similarity.signLshParams(32, 0.4)
    System.err.println(s"[prof] bands=$nBands bits=$bitsPerBand")

    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      Similarity.norm(col("embedding")).as("n"))
    val banded = base.select(col("id"),
      explode(Similarity.signBandKeys(col("v"), nBands, bitsPerBand, 64, 42L))
        .as("band"))
    val buckets = banded.groupBy("band")
      .agg(graft.plans.BottomKLongs.bottomK(col("id"), 1000).as("ids"))
      .where(size(col("ids")) > 1)
    time("bucket agg")(buckets.write.format("noop").mode("overwrite").save())

    val candidates = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
    val nc = time("candidate explode count")(candidates.count())
    System.err.println(s"[prof] candidates = $nc")

    val full = Similarity.cosineDupPairsBucketed(emb, "vec_id", "embedding",
      threshold = 0.4)
    System.err.println("[prof] join nodes: " + full.queryExecution.executedPlan
      .toString.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.take(80))
      .mkString(" | "))
    val nv = time("end-to-end")(full.count())
    System.err.println(s"[prof] verified pairs = $nv")

    // IVF: build (KMeans + partitioned persist) vs search (probe-pruned
    // scan) — the amortization argument in SCALING.md
    val index = time("ivf build")(
      graft.functions.IvfIndex.build(emb, "vec_id", "embedding", nLists = 16))
    time("ivf search (8 queries)")(
      graft.functions.IvfIndex.search(index,
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, nProbe = 4)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
