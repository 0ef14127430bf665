package graft

import graft.queries.{PipelineQueries, SqlQueries, TapQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: the tap's own surface
  * (SURVEY §2.1/§2.2), the SQL surface the reference delegates to
  * PostgreSQL (§2.3), and the training-data pipeline extensions.
  * `oracleSql` carries the DuckDB-equivalent SQL for every entry whose
  * semantics are SQL-expressible; hash-based operators get rows-only
  * checks plus value-level ScalaTest coverage.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TapQueries.queries ++ SqlQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    TapQueries.oracles ++ SqlQueries.oracles ++ PipelineQueries.oracles
}
