package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: pairwise co-occurrence rules with
  * exact integer support/confidence/lift on the parts-per-million plane
  * (no float anywhere, bit-portable across engines).
  */
object Baskets {

  /** Item-pair association rules over (basket, item) rows: for every
    * unordered item pair appearing in ≥ `minPairCount` baskets, the pair
    * count, per-item basket counts, and support / confidence / lift
    * scaled ×1e6 with truncating integer division.
    *
    * 100 TB shape: baskets are naturally bounded (a purchase order holds
    * a handful of lines), so the within-basket pair explode is O(k²) per
    * basket with tiny k — the same bounded-blowup argument as the
    * degree-ordered triangle count; pair and item counts partial-agg
    * before their exchanges, and the 1-row basket total broadcasts.
    * The ppm products assume `n_ab · n_baskets · 1e6 < 2⁶³` — holds to
    * ~10¹² baskets; past that, move lift to a rational (num, den) pair.
    * Hub items (in almost every basket) would need the stop-shingle-style
    * cap the near-dup family uses; retail baskets do not exhibit them.
    */
  def pairRules(items: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long): DataFrame = {
    val it = items.select(col(basketCol).as("__o"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = it.agg(countDistinct(col("__o")).as("n_baskets"))
    val itemCounts = it.groupBy(col("__i")).agg(count(lit(1)).as("__cnt"))
    val pairs = it.as("a")
      .join(it.as("b"),
        col("a.__o") === col("b.__o") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("__i").as("item_a"),
        col("__cnt").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"),
        col("__cnt").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        expr("n_ab * 1000000 div n_baskets").as("support_ppm"),
        expr("n_ab * 1000000 div n_a").as("conf_ppm"),
        expr("n_ab * n_baskets * 1000000 div (n_a * n_b)").as("lift_ppm"))
  }
}
