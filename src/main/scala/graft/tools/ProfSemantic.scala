package graft.tools

import graft.Tables
import graft.functions.Similarity
import org.apache.spark.sql.SparkSession

/** Timing probe for the semantic-dedup verify stage: exact bucket-local
  * cosine vs the PQ-pruned form, in the VERIFY-BOUND regime (few large
  * clusters — nClusters fixed small so per-bucket pairwise work, not the
  * driver quantizer fit, dominates). This is the regime a 100 TB corpus
  * with SemDeDup's k ∝ n rule reaches whenever cluster populations sit
  * at the maxCluster cap.
  *
  * Usage: tools/run.sh graft.tools.ProfSemantic <sfDir> [nClusters]
  */
object ProfSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nClusters = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.read(spark, sfDir, "embeddings")
    emb.count() // warm the scan

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n pairs)")
    }
    // warm-up round (JIT) then measured round, exact and PQ interleaved
    for (round <- Seq("warmup", "measured")) {
      time(s"exact/$round") {
        Similarity.semanticDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, nClusters = nClusters).count()
      }
      for (ksub <- Seq(16, 64, 256)) time(s"pq$ksub/$round") {
        Similarity.semanticDupPairsPq(emb, "vec_id", "embedding",
          threshold = 0.4, nClusters = nClusters, ksub = ksub).count()
      }
    }
    spark.stop()
  }
}
