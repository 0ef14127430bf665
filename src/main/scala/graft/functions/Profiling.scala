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
    val aggExprs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
      "__rows AS n_rows")
  }
}
