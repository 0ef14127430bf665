package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connectivity ([[Components]]):
  * power-iteration ranking over an edge list, in the same
  * shuffle-per-round, lineage-truncated shape as the CC loop.
  */
object Graph {

  /** Fixed-point-arithmetic PageRank — power iteration with every step
    * in EXACT integer (Long) arithmetic so the result is bit-portable
    * across partitionings, reduce orders, and engines (a double-sum
    * PageRank is partition-order-dependent; this one hash-checks
    * against a SQL replay):
    *
    *   rank_0(v)   = scale
    *   rank_i+1(v) = (dampNum_c * scale) div dampDen
    *                 + (dampNum * Σ_{u→v} (rank_i(u) div outdeg(u)))
    *                   div dampDen
    *
    * where dampNum_c = dampDen − dampNum (the 1−d teleport term). All
    * divisions truncate (operands are non-negative, so Spark's `div`
    * and SQL `//`/floor agree). Dangling nodes contribute nothing
    * (their mass leaks — the standard simplification; the oracle leaks
    * identically).
    *
    * Returns (`node`, `rank`) for every distinct node in `edges`.
    *
    * 100 TB shape: one hash join (ranks ⋈ degree-annotated edges on the
    * source key) plus one partial-aggregated groupBy(dst).sum per
    * iteration — the canonical Pregel superstep as two key-partitioned
    * shuffles, no collect, no windows. The degree-annotated edge list is
    * computed once and localCheckpoint'd; each round's rank table is
    * checkpointed too, so k rounds never stack k shuffle stages into one
    * plan. Overflow headroom: Σ rank ≤ n·scale, and the largest
    * intermediate is dampNum·Σ — at scale=10⁶ and dampNum=85 that stays
    * inside Long past 10⁹ nodes.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int, scale: Long = 1000000L,
                         dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // degree-annotated edges: computed once, reused every round
    val eDeg = e.join(outdeg, "src").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val base = (dampDen - dampNum).toLong * scale / dampDen
    var ranks = nodes.withColumn("rank", lit(scale))
    var i = 0
    while (i < iters) {
      ranks = superstep(ranks, eDeg, nodes, base, dampNum, dampDen)
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** One power-iteration superstep (the unit [[pageRankFixedPoint]]
    * checkpoints per round — exposed so the plan shape is auditable:
    * PlanAuditSpec asserts the contribution sum partial-aggregates and
    * nothing plans a nested loop).
    */
  private[graft] def superstep(ranks: DataFrame, eDeg: DataFrame,
                               nodes: DataFrame, base: Long,
                               dampNum: Int, dampDen: Int): DataFrame = {
    val contrib = ranks
      .join(eDeg, col("node") === col("src"))
      .select(col("dst").as("node"),
        expr("rank div deg").as("c"))
      .groupBy("node")
      .agg(sum(col("c")).as("m"))
    nodes
      .join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen"))
          .as("rank"))
  }
}
