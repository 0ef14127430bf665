package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer/corpus analytics built on an exact DISTRIBUTED global rank:
  * the two-phase (range-bucket local row_number + bucket prefix offsets)
  * pattern — SQL-`ntile` semantics without ever moving the table into a
  * single-partition window.
  */
object Analytics {

  /** Exact 1-based global rank of every row by (`valueCol` asc, `tieCol`
    * asc), both BIGINT-valued, without a corpus-wide window: rows bucket
    * by the division-free range formula (monotone in the value, so
    * buckets are contiguous in sort order), rank locally inside each
    * (bucket) partition, and add per-bucket prefix-count offsets — the
    * offsets table is `nRangeBuckets` rows, windowed and broadcast as
    * metadata. Descending ranks: negate the value column first.
    *
    * Returns the input columns plus `__rank` and `__n` (total rows).
    */
  def globalRank(df0: DataFrame, valueCol: String, tieCol: String,
      nRangeBuckets: Int = 256): DataFrame = {
    // materialize the input ONCE: three consumers below (the bounds agg,
    // the bucketed ranking, the per-bucket counts) otherwise re-execute
    // the caller's upstream subtree per consumer — and rfmSegments CHAINS
    // three of these passes, so the recompute compounds geometrically
    // (events_rfm's final plan measured 9,006 operators / 261 Exchanges).
    // The table is one row per ranked entity (user-count-sized here),
    // the same size class the rank pass shuffles anyway.
    val df = df0.localCheckpoint(true)
    val bounds = df.agg(min(col(valueCol)).as("__lo"),
      max(col(valueCol)).as("__hi"), count(lit(1)).as("__n"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__b",
        expr(s"($valueCol - __lo) * $nRangeBuckets div (__hi - __lo + 1)"))
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col(valueCol), col(tieCol))
    val local = bucketed
      .withColumn("__rn", row_number().over(wLocal).cast("long"))
    val cnts = bucketed.groupBy("__b").agg(count(lit(1)).as("__c"))
    val wPre = Window.orderBy(col("__b")) // nRangeBuckets rows — metadata
    val offs = cnts.withColumn("__off",
        coalesce(sum(col("__c")).over(
          wPre.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offs), Seq("__b"))
      .withColumn("__rank", col("__off") + col("__rn"))
      .drop("__b", "__rn", "__off", "__lo", "__hi")
  }

  /** SQL-standard `ntile(k)` from a 1-based rank and the row total: the
    * first `n mod k` buckets take `n div k + 1` rows, the rest
    * `n div k` — identical to Spark's and DuckDB's window ntile under the
    * same total order, but computed arithmetically from the distributed
    * rank (no window).
    */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = expr(
    s"""CAST(CASE
       |  WHEN $rankCol <= (($nCol div $k) + 1) * ($nCol % $k)
       |  THEN ($rankCol - 1) div (($nCol div $k) + 1) + 1
       |  ELSE ($nCol % $k) +
       |    ($rankCol - 1 - (($nCol div $k) + 1) * ($nCol % $k))
       |      div ($nCol div $k) + 1
       |END AS INT)""".stripMargin)

  /** RFM customer segmentation — recency / frequency / monetary quintile
    * scores per user, every step exact-integer: recency in whole days
    * against the corpus's latest activity day, monetary on the cent
    * plane, and the three quintiles via [[globalRank]] + arithmetic
    * ntile — deterministic total orders (metric, user_id), NO
    * single-partition window even though the oracle replays with one.
    *
    * 100 TB shape: events collapse to one row per user first (partial
    * agg); the three rank passes run over the user table with range
    * buckets + broadcast offsets.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, k: Int = 5): DataFrame = {
    val users = events.groupBy(col(userCol))
      .agg(date_trunc("day", max(col(tsCol))).as("__last_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col(valueCol) * 100).cast("long")).as("monetary_cents"))
    val gday = users.agg(max(col("__last_day")).as("__gday"))
    val base = users.crossJoin(broadcast(gday))
      .withColumn("rec_days", datediff(col("__gday"), col("__last_day")))
      .select(col(userCol), col("rec_days"), col("frequency"),
        col("monetary_cents"))
    def bucket(metricExpr: Column,
        outCol: String): DataFrame => DataFrame = df =>
      globalRank(df.withColumn("__m", metricExpr.cast("long")), "__m",
          userCol)
        .withColumn(outCol, ntileFromRank("__rank", "__n", k))
        .drop("__m", "__rank", "__n")
    val scored = Seq(
      bucket(col("rec_days"), "r_bucket"),          // recent = low bucket
      bucket(-col("frequency"), "f_bucket"),        // frequent = low bucket
      bucket(-col("monetary_cents"), "m_bucket")    // big spender = low
    ).foldLeft(base)((d, f) => f(d))
    scored.withColumn("rfm",
      (col("r_bucket") * 100 + col("f_bucket") * 10 + col("m_bucket"))
        .cast("int"))
  }

  /** Top-k most common length-3 event paths (sequential pattern mining,
    * the product-analytics "user flows" rollup): per user, consecutive
    * event-type triples in (ts, event_id) order, counted corpus-wide,
    * top-k by (count desc, path asc — deterministic under ties).
    *
    * 100 TB shape: two keyed lag windows (user partitions — bounded),
    * one partial-agg groupBy on the triple, TakeOrderedAndProject for
    * the top-k. No corpus-wide window, no collect.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("e1", lag(col(typeCol), 2).over(w))
      .withColumn("e2", lag(col(typeCol), 1).over(w))
      .where(col("e1").isNotNull)
      .groupBy(col("e1"), col("e2"), col(typeCol).as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }
}
