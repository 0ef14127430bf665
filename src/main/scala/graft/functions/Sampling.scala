package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Random `df.sample`
  * is seed-stable only for a fixed partitioning; these are *content*-keyed,
  * so membership survives repartitioning, incremental reruns, and
  * cross-engine replication — the property a reproducible data pipeline
  * actually needs.
  */
object Sampling {

  /** Keep rows whose key hashes into the lowest `fraction` of hash space.
    * Membership is a pure function of (key, seed): stable across runs,
    * partitionings, and cluster sizes; composable (a 1% sample is a subset
    * of the 10% sample with the same seed).
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val cut = (fraction * (1L << 32).toDouble).toLong
    df.where(pmod(xxhash64(col(keyCol), lit(seed)), lit(1L << 32)) < cut)
  }

  /** Per-stratum hash sampling: fractions by stratum value, default 0 for
    * unlisted strata (drop).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           seed: Long = 42L): DataFrame = {
    val cutExpr = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit((f * (1L << 32).toDouble).toLong))
        .otherwise(acc)
    }
    df.where(pmod(xxhash64(col(keyCol), lit(seed)), lit(1L << 32)) < cutExpr)
  }
}
