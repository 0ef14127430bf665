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

  // ------------------------------------------------- cross-engine portable

  /** `floor(fraction · 16^8)` as 8 lowercase hex digits — the membership
    * cut for [[portableHashSample]]. Lexicographic comparison of
    * fixed-width lowercase hex strings equals numeric comparison, so the
    * same literal works in any engine.
    */
  def hexCut(fraction: Double): String =
    f"${(fraction * (1L << 32).toDouble).toLong.min((1L << 32) - 1)}%08x"

  /** First 8 hex chars of md5 of the key rendered as a string — the
    * portable bucket value. Matches `substring(md5(CAST(k AS VARCHAR)),1,8)`
    * in DuckDB/PostgreSQL exactly (md5 over UTF-8 bytes, lowercase hex).
    */
  def portableBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8)

  /** Hash sampling whose membership ANY md5-capable engine reproduces
    * bit-for-bit (DuckDB, PostgreSQL, Spark): keep rows whose md5-hex
    * prefix sorts below `hexCut(fraction)`. Same determinism/composability
    * contract as [[hashSample]] at ~md5 cost per row — use the xxhash64
    * form when membership only ever needs computing inside Spark.
    */
  def portableHashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    if (fraction >= 1) df
    else df.where(portableBucket(col(keyCol)) < lit(hexCut(fraction)))
  }

  /** Per-stratum portable sampling; unlisted strata drop. */
  def portableStratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                               fractions: Map[String, Double]): DataFrame = {
    val cutExpr = fractions.foldLeft(lit("00000000")) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(hexCut(f))).otherwise(acc)
    }
    df.where(portableBucket(col(keyCol)) < cutExpr)
  }
}
