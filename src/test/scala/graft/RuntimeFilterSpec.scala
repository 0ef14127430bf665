package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (bloom) filter pushdown: for a selective dim⋈fact join, Catalyst
  * injects a bloom filter built from the dim side's join keys into the fact
  * scan, pruning fact rows BEFORE the shuffle — the runtime half of the
  * 100 TB star-join story (static halves: broadcast dims + partition
  * pruning). Asserted by plan shape (`might_contain` on the fact side) and
  * by result equality with the filter disabled.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def starJoin() = {
    val o = Tables.read(spark, SparkTestSession.Sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val l = Tables.read(spark, SparkTestSession.Sf, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
        count(lit(1)).as("n"))
  }

  test("selective join injects a bloom runtime filter into the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture tables are far below the production thresholds — lower them
      // so the rule fires at test scale
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join → filter matters

      val withFilter = starJoin()
      val optimized = withFilter.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom runtime filter (might_contain):\n$optimized")

      val got = withFilter.collect()
        .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = starJoin().collect()
        .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
      assert(got === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
