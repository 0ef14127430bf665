package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: a hash-partitioned join with one hot key gets
  * its oversized partition split at runtime (the complement to manual
  * salting in functions/Skew — AQE is the first line of defense at scale,
  * salting the explicit fallback for aggregations AQE can't split).
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so fixture-scale skew triggers the rule
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 100k rows on ONE key vs uniform 10k on others: one partition ~10×.
      // The join must be terminal — AQE will not split a skewed join whose
      // output partitioning a downstream stateful operator still requires.
      val skewed = spark.range(0, 110000)
        .select(when(col("id") < 100000, 7L).otherwise(col("id") % 97).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 97).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = skewed.join(dim, "k").select("k", "v", "w")
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n$plan")
      // correctness unaffected by the split: every row matches its dim key
      assert(n === 110000)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
