package graft

import graft.plans.QuantileDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileDigestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)

  test("tdigest estimates stay within rank-accuracy bounds vs exact percentiles") {
    val li = Tables.read(spark, SparkTestSession.Sf, "lineitem")
      .select(col("l_extendedprice").as("v"))
    val est = li.agg(QuantileDigest.tdigest(col("v"), Qs, delta = 100).as("q"))
      .collect()(0).getSeq[Double](0)
    val exact = li.stat.approxQuantile("v", Qs.toArray, 0.0) // relativeError 0 = exact
    val n = li.count().toDouble
    val sorted = li.orderBy("v").as[Double].collect()
    Qs.zip(est).foreach { case (q, e) =>
      // rank error: position of the estimate within the sorted data must be
      // within ~2% of the target rank (δ=100 gives ~1/δ·4·q(1−q) ≤ 1%)
      val rank = sorted.count(_ <= e) / n
      assert(math.abs(rank - q) < 0.02,
        s"q=$q est=$e rank=$rank exact=${exact(Qs.indexOf(q))}")
    }
  }

  test("tdigest merges across partitions (map-side partials)") {
    val df = spark.range(0, 100000).select((col("id") % 9973).cast("double").as("v"))
      .repartition(17)
    val est = df.agg(QuantileDigest.tdigest(col("v"), Seq(0.5), delta = 100).as("q"))
      .collect()(0).getSeq[Double](0)
    // uniform 0..9972: median ≈ 4986
    assert(math.abs(est.head - 4986.0) < 9973 * 0.02, s"median est ${est.head}")
  }

  test("tdigest grouped: per-group medians track group distributions") {
    val df = spark.range(0, 30000)
      .select((col("id") % 3).as("g"), (col("id") % 1000).cast("double").as("v"))
    val meds = df.groupBy("g")
      .agg(QuantileDigest.tdigest(col("v"), Seq(0.5)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).head).toMap
    meds.values.foreach(m => assert(math.abs(m - 499.5) < 30))
  }

  test("digest stays compact: cluster count bounded by O(delta·ln n)") {
    // the q(1−q) size bound yields ≈ (δ/4)·2·ln(n) clusters:
    // δ=100, n=1e5 → ≈575 (~9 KB) vs 100k raw values
    val d = new QuantileDigest.Digest(100)
    val rnd = new scala.util.Random(7)
    (1 to 100000).foreach(_ => d.add(rnd.nextGaussian()))
    assert(d.nClusters < 700, s"clusters=${d.nClusters}")
  }
}
