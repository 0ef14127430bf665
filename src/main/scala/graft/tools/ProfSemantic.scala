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
  * A third arg `tiles` derives a `64·tiles`-dimensional corpus by
  * sign-alternated tiling (`v ⊕ -v ⊕ v ⊕ …`): pairwise cosines are
  * EXACTLY those of the base vectors (each tile contributes ±v_a·±v_b
  * with matching signs), so the output pair set is unchanged while the
  * per-pair exact kernel costs `tiles×` more — the controlled high-dim
  * experiment ROADMAP asked for.
  *
  * Usage: tools/run.sh graft.tools.ProfSemantic <sfDir> [nClusters] [tiles]
  */
object ProfSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nClusters = if (args.length > 1) args(1).toInt else 16
    val tiles = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val base = Tables.read(spark, sfDir, "embeddings")
    val emb = if (tiles <= 1) base
      else base.select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(tiles - 1)), j =>
          transform(col("embedding"), x =>
            x.cast("float") * when(pmod(j, lit(2)) === 0, 1.0f)
              .otherwise(-1.0f)))).as("embedding"))
    emb.count() // warm the scan
    if (tiles > 1) println(s"[prof] dim = ${64 * tiles} (tiles=$tiles)")

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
      // m sweep: m=8 keeps lookups minimal (coarse subspaces, weaker
      // bound); m=dim/8 keeps the dim-64 experiment's subspace
      // granularity (same pruning power, lookups:FMAs stays 1:8)
      val ms = if (tiles <= 1) Seq(8) else Seq(8, 8 * tiles)
      for (m <- ms; ksub <- Seq(16, 64)) time(s"pq m=$m k=$ksub/$round") {
        Similarity.semanticDupPairsPq(emb, "vec_id", "embedding",
          threshold = 0.4, nClusters = nClusters, m = m, ksub = ksub).count()
      }
    }
    spark.stop()
  }
}
