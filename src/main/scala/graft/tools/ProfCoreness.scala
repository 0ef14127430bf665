package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the coreness hot-node bound (VERDICT r10 item 2):
  * a celebrity graph — one hub with `HubDeg` neighbors (default 10⁶)
  * plus a 3-regular-ish background so several h-index rounds run —
  * timed through (a) the pre-r11 row_number form (each round ranks the
  * hub's FULL neighbor list in one task) and (b) the shipped
  * capped-histogram form (per-key work O(h)). Both must emit identical
  * corenesses; the probe prints both timings and the equality check.
  */
object ProfCoreness {
  def main(args: Array[String]): Unit = {
    val hubDeg = sys.env.getOrElse("GRAFT_HUB_DEG", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    // hub 0 — HubDeg leaves; the first min(HubDeg, 10⁶) leaves each
    // close a triangle with two FRESH nodes (leaf-x-y-leaf), so the
    // decomposition has structure (triangles 2-core, the hub h-indexes
    // down over rounds) yet converges in a handful of rounds —
    // INDEPENDENT triangles, unlike a chained background whose value
    // decreases propagate one node per round from the ends (O(n)
    // rounds, past any sane maxRounds). The star dominates the edge
    // count, so the timing isolates the hot-node handling.
    val triN = math.min(hubDeg, 1000000L)
    val star = spark.range(1, hubDeg + 1)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val x = (c: org.apache.spark.sql.Column) => c + lit(2L * hubDeg)
    val y = (c: org.apache.spark.sql.Column) => c + lit(4L * hubDeg)
    val leaves = spark.range(1, triN + 1)
    val tri = leaves.select(col("id").as("src"), x(col("id")).as("dst"))
      .unionByName(leaves.select(x(col("id")).as("src"), y(col("id")).as("dst")))
      .unionByName(leaves.select(y(col("id")).as("src"), col("id").as("dst")))
    val half = star.unionByName(tri)
    val edges = half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    println(s"[prof] edges = ${edges.count()}")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    /** The pre-r11 per-round form, verbatim: row_number over the full
      * per-dst neighbor list.
      */
    def corenessOld(e: DataFrame, maxRounds: Int): DataFrame = {
      var vals = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("v")).localCheckpoint(true)
      var prevSum = -1L
      var rounds = 0
      var converged = false
      val w = Window.partitionBy("dst").orderBy(col("v").desc)
      while (!converged && rounds < maxRounds) {
        val next = e.join(vals.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), col("v"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .groupBy(col("dst").as("node"))
          .agg(max(least(col("rnk"), col("v"))).as("v"))
          .localCheckpoint(true)
        val s = next.agg(sum(col("v"))).head().getLong(0)
        if (s == prevSum) converged = true
        else { prevSum = s; vals = next; rounds += 1 }
      }
      vals.select(col("node"), col("v").as("coreness"))
    }

    val fast = time("hybrid hot-path") {
      // hotDegree forced below the hub so the capped-histogram branch
      // engages regardless of HubDeg
      val r = graft.functions.Graph.coreness(edges, "src", "dst",
          hotDegree = math.max(1000L, hubDeg / 2))
        .localCheckpoint(true)
      r.count(); r
    }
    if (!sys.env.contains("GRAFT_SKIP_OLD")) {
      val slow = time("row_number (old)") {
        val r = corenessOld(edges, 50).localCheckpoint(true)
        r.count(); r
      }
      val diff = fast.exceptAll(slow).count() + slow.exceptAll(fast).count()
      println(s"[prof] result diff rows = $diff (must be 0)")
    }
    spark.stop()
  }
}
