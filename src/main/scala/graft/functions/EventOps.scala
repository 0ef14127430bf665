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

  /** Autocorrelation SUFFICIENT STATISTICS per series and lag 1..`maxLag`
    * — the exact integer moments (n, Σx, Σy, Σxy, Σx², Σy²) that
    * acf(lag) = corr(x_t, x_{t-lag}) derives from, in the same
    * reduce-order-portable form as `table_corr_stats` (per-row products
    * stay in Long, the big sums ride DECIMAL(38) — a float acf could
    * never hash-check across engines). Pairs where the lagged value
    * falls off the series start are dropped, so each lag's n is
    * `series_len − lag` (the standard unpadded ACF sample).
    *
    * Input must be a DENSE series (one row per `idxCol` tick per key —
    * gap-fill zeros first, or lag-k means "k observations ago", not "k
    * ticks ago").
    *
    * 100 TB shape: ONE per-key window pass materializes all maxLag lag
    * columns (state = maxLag rows per key, keys parallelize), a row-local
    * explode to (key, lag) pairs, then a partial-aggregated groupBy of
    * ≤ |keys|·maxLag groups. The series table is already aggregate-sized
    * (ticks × keys), never raw-event-sized.
    */
  def acfStats(series: DataFrame, keyCol: String, idxCol: String,
               valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(keyCol).orderBy(idxCol)
    val base = series.select(col(keyCol), col(idxCol),
      col(valCol).cast("long").as("__x"))
    val withLags = (1 to maxLag).foldLeft(base) { (df, l) =>
      df.withColumn(s"__y$l", lag(col("__x"), l).over(w))
    }
    withLags
      .select(col(keyCol), col("__x").as("x"),
        explode(array((1 to maxLag).map(l =>
          struct(lit(l).as("l"), col(s"__y$l").as("y"))): _*)).as("p"))
      .select(col(keyCol), col("p.l").as("lag_k"), col("x"), col("p.y").as("y"))
      .where(col("y").isNotNull)
      .groupBy(col(keyCol), col("lag_k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum((col("x") * col("y")).cast("decimal(38,0)"))
          .cast("double").as("sum_xy"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("double").as("sum_xx"),
        sum((col("y") * col("y")).cast("decimal(38,0)"))
          .cast("double").as("sum_yy"))
  }

  /** CUSUM change-point scan, integer-exact: per key, with counts c_i in
    * series order (prefix sums P_i, totals n and S), the classic
    * cumulative deviation from the series mean
    *
    *   CUSUM_i = P_i − i·S/n      (≡ Σ_{j≤i} (c_j − mean))
    *
    * is kept in EXACT integers as dev_i = n·P_i − i·S, and a point is
    * flagged when |CUSUM_i| exceeds λ·√S (λ = `lambdaNum/lambdaDen`) —
    * the Brownian-bridge scaling: under a stable Poisson-ish rate,
    * max|CUSUM| concentrates near √(i·σ²) ≲ √S, so a √S threshold is
    * scale-free (a fixed FRACTION of S would stop firing as the corpus
    * grows). The comparison is squared into pure integers:
    *
    *   flag_i ⇔ (lambdaDen·dev_i)² > lambdaNum²·n²·S
    *
    * — no float ever enters the decision, so it hash-checks across
    * engines. A sustained rate shift makes |CUSUM| ramp to its maximum
    * AT the change point (argmax-of-|dev| is the classic estimator);
    * emitting every flagged tick keeps the operator relational.
    *
    * 100 TB shape: one per-key ordered window for (i, P_i) and one
    * per-key total — per-key state is a running pair, keys parallelize,
    * and the series table is aggregate-sized (ticks × keys), never
    * raw-event-sized. Headroom: |dev| ≤ n·S so dev² needs
    * 2·(log₂n + log₂S) bits — fine in Long for any hourly grid up to
    * ~10⁷ events per key; past that, cast the squares to DECIMAL(38).
    */
  /** Holt double exponential smoothing (level + trend) in FIXED-POINT
    * integer arithmetic — the forecasting recursion
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * with α = alphaNum/den, β = betaNum/den, state scaled ×1000 and every
    * division a TRUNCATING integer division (Scala `/`, Spark `div`, and
    * DuckDB `//` all truncate toward zero — checked for negative trends
    * too), so the whole recursion is bit-portable. Seed: l_0 = 1000·x_0,
    * b_0 = 0.
    *
    * A true sequential recursion can't be a window (each step needs the
    * PREVIOUS step's output), so this is the one operator family that
    * rides `KeyValueGroupedDataset.flatMapGroups`: one shuffle on the
    * series key, then an in-memory fold over that key's ticks. The
    * contract is per-KEY memory = the key's tick count (series are
    * aggregate-sized: hourly ticks, not raw events) — keys parallelize,
    * the corpus never sits on one task. Emits per tick: x, level, trend,
    * and the one-step-ahead forecast (l + b), all ×1000.
    */
  def holtSmooth(series: DataFrame, keyCol: String, idxCol: String,
                 valCol: String, alphaNum: Long = 3L, betaNum: Long = 2L,
                 den: Long = 10L): DataFrame = {
    require(den > 0 && alphaNum >= 0 && alphaNum <= den &&
      betaNum >= 0 && betaNum <= den,
      s"need 0 <= alphaNum, betaNum <= den, got $alphaNum/$betaNum/$den")
    val spark = series.sparkSession
    import spark.implicits._
    series
      .select(col(keyCol).cast("string"),
        col(idxCol).cast("timestamp"), col(valCol).cast("long"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2.getTime)
        var l = 0L
        var b = 0L
        rows.iterator.zipWithIndex.map { case ((_, t, x), i) =>
          if (i == 0) { l = x * 1000L; b = 0L }
          else {
            val lPrev = l
            l = (alphaNum * x * 1000L + (den - alphaNum) * (l + b)) / den
            b = (betaNum * (l - lPrev) + (den - betaNum) * b) / den
          }
          (k, t, x, l, b, l + b)
        }
      }
      .toDF(keyCol, idxCol, "x", "level_fp", "trend_fp", "forecast_fp")
  }

  def cusumFlags(series: DataFrame, keyCol: String, idxCol: String,
                 valCol: String, lambdaNum: Long, lambdaDen: Long): DataFrame = {
    require(lambdaNum >= 0 && lambdaDen > 0,
      s"bad lambda $lambdaNum/$lambdaDen")
    val w = Window.partitionBy(keyCol).orderBy(idxCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(keyCol)
    val dev = col("__n") * col("__p") - col("__i") * col("__s")
    series.select(col(keyCol), col(idxCol),
        col(valCol).cast("long").as("x"))
      .withColumn("__i", count(lit(1)).over(w))
      .withColumn("__p", sum(col("x")).over(w))
      .withColumn("__n", count(lit(1)).over(tot))
      .withColumn("__s", sum(col("x")).over(tot))
      .select(col(keyCol), col(idxCol), col("x"), dev.as("dev"),
        (dev * dev * (lambdaDen * lambdaDen) >
          col("__n") * col("__n") * col("__s") * (lambdaNum * lambdaNum))
          .as("flagged"))
  }

  /** Lower weighted median of an integer column per group, computed
    * over the per-group VALUE HISTOGRAM (distinct values), never the
    * raw rows — a hot group costs its distinct-value count, not its
    * row count (the q_weighted_median shape).
    */
  def lowerMedianByGroup(df: DataFrame, groupCol: String, valCol: String,
                         out: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__w"))
    val cum = Window.partitionBy(groupCol).orderBy(valCol)
    hist.withColumn("__cum", sum(col("__w")).over(cum))
      .withColumn("__tot", sum(col("__w")).over(
        Window.partitionBy(groupCol)))
      .groupBy(groupCol)
      .agg(min(when(col("__cum") * 2 >= col("__tot"), col(valCol)))
        .as(out))
  }

  /** Robust outlier summary by Median Absolute Deviation on an integer
    * value plane: per group, the lower median, the MAD (median of
    * |x − median|), and the count of rows past the 3σ-equivalent cut
    * `10000·|x − med| > 44478·MAD` (3 × 1.4826 scaled — the Gaussian
    * consistency constant, compared in exact integers, no floats).
    * Unlike mean/stddev z-scores, the planted outliers themselves
    * cannot drag the threshold (50% breakdown point).
    */
  def madOutlierSummary(df: DataFrame, groupCol: String,
                        valCol: String): DataFrame = {
    val med = lowerMedianByGroup(df, groupCol, valCol, "med")
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = lowerMedianByGroup(dev, groupCol, "__dev", "mad")
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(min(col("med")).as("med_" + valCol),
        min(col("mad")).as("mad_" + valCol),
        sum(when(col("__dev") * 10000 > col("mad") * 44478, 1L)
          .otherwise(0L)).as("n_flagged"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-group ordinary-least-squares trend over integer (x, y) pairs:
    * the five sufficient moments in ONE partial-aggregated pass, slope
    * as the exact integer pair (num, den) plus a truncating-div ppm
    * fixed point — zero floats, so the fitted trend is bit-portable
    * (the same discipline as the ACF/CUSUM/EWMA family).
    */
  def olsTrend(df: DataFrame, groupCol: String, xCol: String,
               yCol: String, scale: Long = 1000000L): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"),
        sum(col(xCol) * col(xCol)).as("sxx"))
      .select(col(groupCol), col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_ppm",
        when(col("slope_den") =!= 0L,
          expr(s"(slope_num * ${scale}L) div slope_den"))
          .otherwise(lit(null).cast("long")))

  /** Sweep-line concurrency from (session-start-hour, session-end-hour)
    * rows: +1/−1 deltas partial-aggregate PER HOUR first, then one
    * cumulative window over the metadata-sized hour spine — shared by
    * the batch entry and the streaming twin (which feeds it the sealed
    * sessions from the sink table).
    */
  def concurrencySweep(spans: DataFrame): DataFrame = {
    val deltas = spans.select(col("sh").as("h"), lit(1L).as("d"))
      .unionByName(spans.select(
        (col("eh") + expr("INTERVAL 1 HOUR")).as("h"), lit(-1L).as("d")))
      .groupBy("h").agg(sum(col("d")).as("delta"))
    val bounds = spans.agg(min(col("sh")).as("lo"), max(col("eh")).as("hi"))
    bounds.select(explode(expr("sequence(lo, hi, interval 1 hour)"))
        .as("h"))
      .join(deltas, Seq("h"), "left")
      .select(col("h"), coalesce(col("delta"), lit(0L)).as("delta"))
      .withColumn("n_active", sum(col("delta")).over(Window.orderBy("h")))
  }

  /** Kaplan–Meier survival curve from per-subject (duration, event)
    * rows (event=false ⇒ right-censored at that duration): for each
    * event time d, the risk set n_d (subjects with duration ≥ d), the
    * event count, and the survival estimate Π_{d' ≤ d}(1 − e_{d'}/n_{d'}).
    *
    * Determinism: every count is exact; each factor is ONE IEEE
    * division; the product folds over the DURATION-SORTED factor list,
    * so the float chain has a fixed association order on any engine.
    * Scale shape: one partial-agg groupBy to the per-duration histogram
    * (metadata-sized — distinct durations, not subjects), a cum window
    * over it, then row-local prefix products over the collected
    * histogram (bounded by distinct event times by construction —
    * the one collect_list is over that same metadata-sized table).
    */
  def kaplanMeier(durations: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val hist = durations
      .groupBy(col(durCol).cast("long").as("d"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d_events"),
        count(lit(1)).as("d_total"))
    val risk = hist
      .withColumn("n_at_risk",
        sum(col("d_total")).over(Window.orderBy("d")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .where(col("d_events") > 0)
      .select(col("d"), col("d_events"), col("n_at_risk"))
    val packed = risk
      .agg(array_sort(collect_list(struct(col("d"), col("d_events"),
        col("n_at_risk")))).as("arr"))
    packed
      .select(col("arr"), posexplode(col("arr")).as(Seq("i", "e")))
      .select(col("e.d").as("duration"), col("e.n_at_risk"),
        col("e.d_events").as("n_events"),
        expr("""aggregate(slice(arr, 1, i + 1), CAST(1.0 AS DOUBLE),
          (acc, x) -> acc * (CAST(1.0 AS DOUBLE) -
            CAST(x.d_events AS DOUBLE) / CAST(x.n_at_risk AS DOUBLE)))""")
          .as("survival"))
  }
}
