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

  test("saltedJoin: bit-identical to the plain join, salt in the join keys") {
    val spark2 = spark
    import spark2.implicits._
    // hot key 7 carries ~10× the rows; dim has multiple rows per key so
    // the per-replica fan-out matters (each fact row must meet EVERY
    // matching dim row exactly once, on its own salt replica)
    val fact = spark.range(0, 30000)
      .select(when(col("id") < 20000, 7L).otherwise(col("id") % 11).as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 22)
      .select((col("id") % 11).as("k"), col("id").as("w"))
    val plainRows = fact.join(dim, "k").select("k", "v", "w")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val salted = graft.functions.Skew
      .saltedJoin(fact, dim, Seq("k"), buckets = 8, salt = col("v") * 13 + 5)
    val saltedRows = salted.select("k", "v", "w")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(saltedRows === plainRows)
    // the physical join really keys on (k, __salt): with broadcast off,
    // the exchange must hash-partition on both columns
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.functions.Skew
        .saltedJoin(fact, dim, Seq("k"), buckets = 8, salt = col("v"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"expected the salt in the join keys:\n$plan")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
