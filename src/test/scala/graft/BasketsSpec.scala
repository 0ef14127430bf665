package graft

import graft.functions.Baskets
import org.scalatest.funsuite.AnyFunSuite

class BasketsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairRules: hand-computed support/confidence/lift on 4 baskets") {
    // baskets: {1,2,3}, {1,2}, {1,3}, {2} → pairs (1,2)×2, (1,3)×2, (2,3)×1
    val items = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L),
      (40L, 2L),
      (40L, 2L) // duplicate line within a basket must not double-count
    ).toDF("basket", "item")
    val got = Baskets.pairRules(items, "basket", "item", minPairCount = 2L)
      .select("item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
        "support_ppm", "conf_ppm", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    // n_1=3, n_2=3, n_3=2, baskets=4; (2,3) filtered by minPairCount
    assert(got.toSeq === Seq(
      // (1,2): support 2/4=500000, conf 2/3=666666, lift 2·4/(3·3)=888888
      (1L, 2L, 3L, 3L, 2L, 4L, 500000L, 666666L, 888888L),
      // (1,3): conf 2/3, lift 2·4/(3·2)=1333333
      (1L, 3L, 3L, 2L, 2L, 4L, 500000L, 666666L, 1333333L)))
  }

  test("pairRules: single-item baskets produce no rules") {
    val items = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("basket", "item")
    assert(Baskets.pairRules(items, "basket", "item", 1L).count() === 0L)
  }
}
