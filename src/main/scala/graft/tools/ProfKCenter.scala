package graft.tools

import graft.Tables
import graft.functions.Similarity
import org.apache.spark.sql.SparkSession

/** Scaling evidence for the two k-center forms (SCALING.md workflow):
  * times [[Similarity.kCenterGreedy]] (k sequential corpus passes) vs
  * [[Similarity.kCenterSampled]] (two corpus passes flat in k) across a
  * k sweep, plus the semantic-index probe with build amortized out
  * (the deployed steady state — the gate entry times build+probe
  * together by the dedup_incremental convention).
  * Usage: `tools/run.sh graft.tools.ProfKCenter <sfDir> [k1,k2,...]`.
  */
object ProfKCenter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.drop(1).headOption.getOrElse("12,48")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(
        f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.read(spark, dir, "embeddings")
    // warm the scan
    emb.write.format("noop").mode("overwrite").save()

    ks.foreach { k =>
      time(s"kCenterGreedy  k=$k (k passes)")(
        noop(Similarity.kCenterGreedy(emb, "vec_id", "embedding", k)))
      time(s"kCenterSampled k=$k (2 passes)")(
        noop(Similarity.kCenterSampled(emb, "vec_id", "embedding", k,
          sampleCap = math.max(64, 4 * k))))
    }

    // semantic index: build once (timed), then probe-only twice — the
    // second probe is the steady state an ingest loop sees
    val corpus = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val batch = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val tmp = graft.tools.Scratch.dir("graft_prof_semidx")
    time("semanticIndex build+save") {
      val idx = Similarity.buildSemanticIndex(corpus, "vec_id", "embedding",
        nClusters = Similarity.semanticClusterCount(corpus.count()))
      Similarity.saveSemanticIndex(idx, s"$tmp/i")
    }
    val loaded = Similarity.loadSemanticIndex(spark, s"$tmp/i")
    time("semanticIndex probe (cold)")(
      noop(Similarity.probeSemanticIndex(loaded, batch,
        "vec_id", "embedding", 0.4)))
    time("semanticIndex probe (warm)")(
      noop(Similarity.probeSemanticIndex(loaded, batch,
        "vec_id", "embedding", 0.4)))
    spark.stop()
  }
}
