package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log compaction operators — the warehouse-side siblings of the
  * funnel/sessionize analytics: an append-only event stream becomes a
  * slowly-changing-dimension (SCD type 2) history table.
  */
object EventOps {

  /** SCD2 change compaction (gaps-and-islands): per `keyCol`, order the
    * change log by (`tsCol`, `tieCol`) and collapse each maximal run of
    * equal `attrCol` values into one validity interval —
    * `[valid_from, valid_to)` with `valid_to` = the next run's first
    * timestamp and NULL (open / `is_current`) for the last run. Emits
    * one row per (key × run): key, attr value, valid_from, valid_to,
    * n_events (rows compacted into the run), is_current.
    *
    * Run detection is null-safe (`<=>`): a NULL attr value is a run of
    * its own, distinct from any non-NULL neighbor.
    *
    * 100 TB shape: both windows partition by the entity key — state per
    * window is one row (lag) / a running counter, and rows for one key
    * land on one task, so the operator scales with the number of keys,
    * never the corpus. The second window runs over the already-compacted
    * run table (one row per run, not per event). No corpus-wide window,
    * no collect.
    */
  def changeIntervals(ev: DataFrame, keyCol: String, attrCol: String,
                      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = ev
      .withColumn("__chg",
        when(!(lag(col(attrCol), 1).over(w) <=> col(attrCol)), 1)
          .otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(run))
    val runs = flagged
      .groupBy(col(keyCol), col("__run"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(keyCol).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }

  /** Seasonal profile — the hour-of-day decomposition of an event
    * series: per (type, hour-of-day) bucket, the event count, exact
    * value sum, and the bucket's share of its type's traffic in ppm
    * (`n·10⁶ div type_total` — truncating integer division, bit-portable
    * like every ppm rate in the mixing family). This is the seasonal
    * component a naive seasonal decomposition subtracts, and the
    * baseline a rate-anomaly monitor compares against (events_anomaly's
    * global-window complement).
    *
    * Scale shape: one partial-aggregated groupBy on (type, hod) — ≤
    * 24·|types| rows out of any corpus — plus a broadcast-sized join of
    * per-type totals derived from the SAME aggregate (no second corpus
    * pass). Value sums ride DECIMAL(18,6), cast to double only at
    * output.
    */
  def seasonalProfile(ev: DataFrame, typeCol: String = "event_type",
                      tsCol: String = "ts",
                      valueCol: String = "value"): DataFrame = {
    val byHod = ev
      .select(col(typeCol).as("event_type"),
        hour(col(tsCol)).as("hod"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__vs"))
    val tot = byHod.groupBy("event_type").agg(sum(col("n")).as("__tot"))
    byHod.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("n"),
        col("__vs").cast("double").as("value_sum"),
        expr("n * 1000000 div __tot").as("share_ppm"))
  }
}
