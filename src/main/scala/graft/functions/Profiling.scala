package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column statistics for monitoring and
  * contract checks (null fractions creeping up, key cardinality drift,
  * out-of-range values) — the warehouse-table sibling of the documents
  * `corpus_profile`.
  */
object Profiling {

  /** Per-column profile — ONE pass over the table: every column's
    * null count, exact distinct count, and min/max are aggregated in a
    * single `agg` (Spark plans the multi-column distinct as one Expand —
    * k× row expansion, one scan, partial-aggregated), then the 1-row
    * wide result unpivots with `stack` into one row per column. Emits
    * (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    * with min/max cast to string.
    *
    * Exact distincts are the oracle-checkable contract here; monitoring
    * at 100 TB swaps `countDistinct` for `approx_count_distinct` without
    * changing the plan shape (the Expand drops, making it strictly
    * cheaper). Callers should pass int/string/date columns — float/
    * timestamp-to-string formatting is engine-specific.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    // One grouped aggregation PER COLUMN instead of one multi-distinct
    // agg: k exact countDistincts in a single agg plan as an Expand —
    // every input row replicates k× before the exchange (measured 7.9 s
    // at sf0.1 for k=5 ⇒ 3M expanded rows). Grouping by the column
    // first is partial-agg friendly: map-side combine collapses each
    // partition to its distinct values, so every exchange carries
    // |distinct| rows, never k×|rows| — and all stats (nulls, distinct,
    // min, max, total) derive from the SAME grouped result, one narrow
    // column-pruned scan each. The k branches union into one plan and
    // run as parallel stages of a single job.
    val perCol = cols.map { c =>
      df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__cnt"))
        .agg(
          sum(when(col("__v").isNull, col("__cnt")).otherwise(0L))
            .as("n_nulls"),
          count(when(col("__v").isNotNull, 1)).as("n_distinct"),
          min(col("__v")).cast("string").as("min_value"),
          max(col("__v")).cast("string").as("max_value"),
          // count(lit(1)) semantics of the old single-agg form: 0, not
          // NULL, on an empty slice (profileDrift's oracle pins it)
          coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"))
        .select(lit(c).as("column_name"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"),
          col("n_rows"))
    }
    perCol.reduce(_.unionByName(_))
  }

  /** [[tableProfile]] with `approx_count_distinct` (HLL++) in place of
    * the exact distinct — the monitoring-cadence form: the multi-column
    * Expand drops from the plan (no k× row expansion), so the profile
    * is one plain partial-aggregated scan. Nulls/min/max/rows stay
    * exact; the distinct estimate is engine-specific and gate-checked
    * by readback (exact counts ride alongside for the error story).
    */
  def tableProfileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggExprs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        approx_count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct_approx, min_value, max_value)",
      "__rows AS n_rows")
  }

  /** Join-key skew profile: the top-k heaviest keys of `keyCol` with
    * per-key row counts, annotated with corpus totals and an integer
    * skew factor `skew_x1000 = max_rows_key · 1000 · n_keys / n_rows`
    * (1000 = perfectly uniform; the pre-join diagnostic that decides
    * whether a salted join / AQE skew split is needed).
    *
    * Plan shape: one partial-agg groupBy, then TakeOrderedAndProject for
    * the top-k (count desc, key asc — deterministic under ties) and a
    * broadcast of the 1-row totals. Integer division keeps the factor
    * bit-portable — no float anywhere.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows_key"))
    val totals = counts.agg(
      sum(col("n_rows_key")).as("n_rows_total"),
      count(lit(1)).as("n_keys_total"),
      max(col("n_rows_key")).as("max_rows_key"))
    counts.orderBy(col("n_rows_key").desc, col(keyCol)).limit(topK)
      .crossJoin(totals)
      .withColumn("skew_x1000",
        expr("max_rows_key * 1000 * n_keys_total div n_rows_total"))
  }

  /** Exact equi-width histogram of a numeric column, computed on an
    * integer plane (`centsExpr` must already be a BIGINT — e.g.
    * `floor(price * 100)` — so bucket assignment is bit-portable).
    * Bucket `i` covers `[min + i·w, min + (i+1)·w)` with
    * `w = (max − min + 1) / nBuckets` rational — assignment uses the
    * division-free integer form `(v − min) · nBuckets div (max − min + 1)`.
    *
    * Plan shape: one 1-row bounds aggregate broadcast into a second scan's
    * projection, then a partial-agg groupBy on the bucket id — two scans,
    * no shuffle wider than nBuckets rows.
    */
  /** Declarative data-quality checks (the dbt-test surface): each helper
    * returns a 1-row (check_name, table_name, n_violations, n_rows)
    * report; a suite is a `unionByName` of independent aggregates. Every
    * check is a partial-agg scan or one key join — no check ever costs
    * more than the cheapest full pass over its table.
    */
  def checkNotNull(df: DataFrame, table: String, c: String): DataFrame =
    df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_rows"))
      .select(lit(s"not_null:$c").as("check_name"),
        lit(table).as("table_name"), col("n_violations"), col("n_rows"))

  /** Duplicate-key mass: Σ (count−1) over keys seen more than once. */
  def checkUnique(df: DataFrame, table: String, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n") - 1L).as("n_violations"),
        sum(col("__n")).as("n_rows"))
      .select(lit(s"unique:$c").as("check_name"),
        lit(table).as("table_name"), col("n_violations"), col("n_rows"))

  def checkAcceptedValues(df: DataFrame, table: String, c: String,
      values: Seq[String]): DataFrame =
    df.agg(sum(when(!col(c).isin(values: _*), 1L).otherwise(0L))
        .as("n_violations"), count(lit(1)).as("n_rows"))
      .select(lit(s"accepted_values:$c").as("check_name"),
        lit(table).as("table_name"), col("n_violations"), col("n_rows"))

  def checkRange(df: DataFrame, table: String, c: String, lo: Long,
      hi: Long): DataFrame =
    df.agg(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
        .as("n_violations"), count(lit(1)).as("n_rows"))
      .select(lit(s"range:$c").as("check_name"),
        lit(table).as("table_name"), col("n_violations"), col("n_rows"))

  /** Referential integrity: child rows whose non-null FK misses every
    * parent PK — a left-anti key join (broadcast when the parent's
    * distinct keys are small), then one count.
    */
  def checkRefIntegrity(child: DataFrame, table: String, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.where(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.crossJoin(child.agg(count(lit(1)).as("n_rows")))
      .select(lit(s"ref_integrity:$fk").as("check_name"),
        lit(table).as("table_name"), col("n_violations"), col("n_rows"))
  }

  /** Inclusion-dependency profile — foreign-key DISCOVERY, the
    * complement of [[checkRefIntegrity]] (which validates a KNOWN key
    * over rows): for a candidate (child → parent) column pair, how much
    * of the child's distinct value set the parent covers. Emits one row
    * (`child`, `parent`, `n_child_distinct`, `n_missing`,
    * `containment_ppm`) — containment 10⁶ means the pair behaves as a
    * real FK; profilers union these rows over a candidate matrix.
    *
    * Scale shape: both sides project to ONE column and partial-agg
    * deduplicate before the left-anti hash join, so the exchanges carry
    * distinct keys, never rows — the only affordable shape when the
    * child is a 100 TB fact table.
    */
  def inclusionProfile(child: DataFrame, childCol: String, childName: String,
                       parent: DataFrame, parentCol: String,
                       parentName: String): DataFrame = {
    val c = child.select(col(childCol).as("k"))
      .where(col("k").isNotNull).distinct()
    val p = parent.select(col(parentCol).as("k"))
      .where(col("k").isNotNull).distinct()
    val missing = c.join(p, Seq("k"), "left_anti")
    c.agg(count(lit(1)).as("n_child_distinct"))
      .crossJoin(missing.agg(count(lit(1)).as("n_missing")))
      .select(lit(childName).as("child"), lit(parentName).as("parent"),
        col("n_child_distinct"), col("n_missing"),
        expr("(n_child_distinct - n_missing) * 1000000" +
          " div n_child_distinct").as("containment_ppm"))
  }

  /** Functional-dependency profile — does `det → dep` hold? The other
    * half of schema discovery next to [[inclusionProfile]] (FKs relate
    * tables; FDs expose keys, denormalization, and derived columns
    * WITHIN one). Exact test on distinct projections: the determinant
    * (possibly composite) determines `dep` iff every determinant tuple
    * maps to exactly one dep value, i.e.
    * |distinct(det)| = |distinct(det, dep)|. Emits one row per
    * candidate: (`fd`, `n_det`, `n_pairs`, `violations` = n_pairs −
    * n_det — the number of EXTRA (det, dep) associations, 0 iff the FD
    * holds — and `holds`). Rows with a null determinant part or null
    * dep are excluded (SQL null ≠ null makes them vacuous).
    *
    * Scale shape: ONE partial-aggregated distinct count per side over
    * the candidate's projection — exchanges carry distinct tuples,
    * never rows; a candidate matrix unions these constant-width rows.
    */
  def fdProfile(df: DataFrame, det: Seq[String], dep: String,
                label: String): DataFrame = {
    val dets = det.map(c => col(c).cast("string"))
    val depC = col(dep).cast("string")
    df.where(dets.map(_.isNotNull).reduce(_ && _) && depC.isNotNull)
      .agg(
        countDistinct(struct(dets: _*)).as("n_det"),
        countDistinct(struct(dets :+ depC: _*)).as("n_pairs"))
      .select(lit(label).as("fd"), col("n_det"), col("n_pairs"),
        (col("n_pairs") - col("n_det")).as("violations"),
        (col("n_pairs") === col("n_det")).as("holds"))
  }

  /** k-anonymity audit — the governance check a dataset release runs
    * before publication: group rows by their QUASI-IDENTIFIER tuple
    * (the columns an attacker could link to an external register) and
    * flag every equivalence class smaller than `k` — those rows are
    * re-identifiable and must be suppressed or generalized. Emits one
    * row per class: the quasi values, `class_size`, `at_risk`.
    *
    * Scale shape: one partial-aggregated groupBy on the quasi tuple —
    * the map-side combine collapses each task's rows to its distinct
    * classes, so the shuffle carries class counts, not rows. The risky
    * classes (the usual consumer: a suppression join back) are by
    * definition the SMALL ones, so the verdict table broadcasts.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, s"bad kAnonymity args: $quasiCols/$k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity — [[kAnonymity]]'s companion re-identification check:
    * a k-anonymous equivalence class is still unsafe if everyone in it
    * shares the sensitive value (the homogeneity attack). Per
    * quasi-identifier class: size, number of DISTINCT sensitive values,
    * and the at-risk flag `n_sensitive < l`.
    *
    * 100 TB shape: one exact two-level aggregate — (quasi*, sensitive)
    * partial count, then a quasi-level rollup — both partial-aggregated,
    * output is class-count-sized. No window, no self-join.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1, s"bad lDiversity args: $quasiCols/$l")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  def histogram(df: DataFrame, centsCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val vals = df.select(col(centsCol).cast("long").as("__v"))
    val bounds = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    vals.crossJoin(bounds)
      .withColumn("bucket",
        expr(s"least($nBuckets - 1, (__v - __lo) * $nBuckets div (__hi - __lo + 1))")
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("lo_cents"),
        max(col("__v")).as("hi_cents"))
  }

  /** Rank / quantile transform of an integer column per group: each
    * DISTINCT value maps to its fractional rank in ppm — the
    * scale-free, outlier-immune feature normalization (scikit-learn's
    * QuantileTransformer shape). `ppm = count_strictly_smaller_rows ×
    * 10^6 div (total_rows − 1)`, exact integers end to end.
    *
    * Runs over the per-group VALUE HISTOGRAM (one partial-agg groupBy,
    * then a window over distinct values only) — a hot group costs its
    * distinct-value count, never its row count. Output: one row per
    * (group, value) with `ppm`; rows join back by value when the
    * transformed column is needed inline.
    */
  def quantileTransform(df: DataFrame, groupCol: String,
                        valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("w"))
    val cum = Window.partitionBy(groupCol).orderBy(valCol)
    hist.withColumn("cum", sum(col("w")).over(cum))
      .withColumn("total", sum(col("w")).over(
        Window.partitionBy(groupCol)))
      .select(col(groupCol), col(valCol),
        when(col("total") > 1,
          expr("((cum - w) * 1000000) div (total - 1)"))
          .otherwise(lit(0L)).as("ppm"))
  }

  /** Stats-drift monitor between two slices of the same table (e.g.
    * yesterday vs today): both sides run the one-pass [[tableProfile]],
    * then per-column deltas — null-rate delta in ppm (truncating div,
    * exact), distinct-count delta, and a null-safe min/max range-change
    * flag. The 100 TB shape is two single-pass aggregates joined on the
    * metadata-sized column list — drift detection never re-reads either
    * slice twice.
    */
  def profileDrift(a: DataFrame, b: DataFrame,
                   cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, p: String) =
      tableProfile(df, cols).select(col("column_name"),
        col("n_nulls").as(s"${p}_nulls"),
        col("n_distinct").as(s"${p}_distinct"),
        col("min_value").as(s"${p}_min"),
        col("max_value").as(s"${p}_max"),
        col("n_rows").as(s"${p}_rows"))
    side(a, "a").join(side(b, "b"), "column_name")
      .withColumn("null_rate_delta_ppm",
        expr("(b_nulls * 1000000) div b_rows - (a_nulls * 1000000) div a_rows"))
      .withColumn("distinct_delta", col("b_distinct") - col("a_distinct"))
      .withColumn("range_changed",
        !(col("a_min") <=> col("b_min")) || !(col("a_max") <=> col("b_max")))
  }
}
