package graft

import org.apache.spark.sql.DataFrame

/** Metastore-backed bucketed table registration — the maintained-layout
  * half of the 100 TB join story. Bucketing metadata lives in the catalog,
  * so EVERY later query keyed on the bucket columns (joins, aggregations,
  * [[graft.plans.AsOfJoinPlan]] point-in-time lookups) reads bucket-aligned
  * with no exchange: the shuffle is paid once at write time and amortized
  * across all downstream queries, instead of once per query.
  */
object Catalog {

  /** Register `df` as the managed bucketed table `name`. Idempotent: an
    * existing table is left untouched, so repeated pipeline runs reuse the
    * layout. Sorted buckets additionally satisfy sorted-merge operators'
    * ordering requirements (sort-merge join, AsOfJoinExec) without a
    * per-query sort.
    */
  def ensureBucketed(df: DataFrame, name: String, nBuckets: Int,
                     bucketCols: Seq[String],
                     sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(name)) {
      val w = df.write.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      val sorted =
        if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
      sorted.saveAsTable(name)
    }
  }
}
