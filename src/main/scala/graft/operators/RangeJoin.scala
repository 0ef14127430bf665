package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — points joined into intervals with
  * NO equi-key.
  *
  * Spark plans a bare `p.ts >= i.lo AND p.ts < i.hi` join as a
  * broadcast-nested-loop / cartesian product: every point row against
  * every interval row, the classic 100 TB scale-killer. The standard fix
  * is to MINT the equi-key: quantize the value axis into fixed-width
  * buckets, explode each interval over the buckets it covers, tag each
  * point with its single containing bucket, hash-join on the bucket id,
  * and re-apply the exact range predicate. Each (point, interval) match
  * is produced exactly once — the point lives in ONE bucket and an
  * interval covers any bucket at most once — so no distinct is needed.
  *
  * Cost model: interval rows replicate by `ceil(span/bucketWidth)` (pick
  * the width near the median interval span so replication stays O(1));
  * points never replicate. The shuffle carries (bucket, payload) rows,
  * and a hot value range becomes a hot bucket — the usual skew levers
  * (smaller width, AQE skew-join) apply. This is the same minted-key
  * shape as the LSH band join in [[graft.functions.Dedup]].
  *
  * Interval semantics: half-open `[lo, hi)`; `lo`/`hi`/`point` are
  * treated on a numeric axis supplied by `axis` (default: epoch seconds
  * of a timestamp column). The axis may be real-valued — bucket coverage
  * uses `floor(lo/w) .. ceil(hi/w)-1`, valid for fractional endpoints —
  * but axis/width arithmetic happens in double precision, so axes whose
  * values exceed 2^53 (e.g. nanosecond epochs) should be rescaled first.
  */
object RangeJoin {

  /** Default axis: timestamps → epoch seconds (Long). */
  def epochSeconds(c: Column): Column = unix_timestamp(c)

  /** Join `points` into half-open intervals `[loCol, hiCol)` of
    * `intervals`, returning all columns of both (inner join). Column
    * name collisions must be resolved by the caller beforehand.
    *
    * @param bucketWidth bucket size on the numeric axis (e.g. seconds);
    *                    choose ≈ the median interval span.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      axis: Column => Column = epochSeconds): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val p = points.withColumn("__pv", axis(col(pointCol)))
      .withColumn("__bucket", floor(col("__pv") / bucketWidth))
    val i = intervals
      .withColumn("__lo", axis(col(loCol)))
      .withColumn("__hi", axis(col(hiCol)))
      // [lo, hi) covers buckets floor(lo/w) .. ceil(hi/w)-1 — valid for
      // REAL-valued axes too (a fractional hi like 1.2 still reaches
      // bucket 1; on integers it equals floor((hi-1)/w)); an empty
      // interval (hi <= lo) covers nothing and drops out via the guard
      .where(col("__hi") > col("__lo"))
      .withColumn("__bucket", explode(sequence(
        floor(col("__lo") / bucketWidth),
        ceil(col("__hi") / bucketWidth) - 1)))
    p.join(i, Seq("__bucket"))
      .where(col("__pv") >= col("__lo") && col("__pv") < col("__hi"))
      .drop("__bucket", "__pv", "__lo", "__hi")
  }

  /** Interval-OVERLAP join: all (a, b) pairs whose half-open intervals
    * intersect (`a.lo < b.hi AND b.lo < a.hi`). Both sides explode over
    * their covered buckets, so a pair sharing several buckets would match
    * several times — the exactly-once trick is the CANONICAL bucket: a
    * pair is emitted only from `floor(max(a.lo, b.lo) / width)`, the
    * first bucket both intervals cover, which every overlapping pair
    * shares and shares exactly once. No distinct over the output, same
    * minted-equi-key shuffle shape as [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
                      right: DataFrame, rightLo: String, rightHi: String,
                      bucketWidth: Long,
                      axis: Column => Column = epochSeconds): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def banded(df: DataFrame, lo: String, hi: String,
               loOut: String, hiOut: String): DataFrame = df
      .withColumn(loOut, axis(col(lo)))
      .withColumn(hiOut, axis(col(hi)))
      .where(col(hiOut) > col(loOut))
      // same real-valid covering as pointInInterval: floor(lo/w) .. ceil(hi/w)-1
      .withColumn("__bucket", explode(sequence(
        floor(col(loOut) / bucketWidth),
        ceil(col(hiOut) / bucketWidth) - 1)))
    val l = banded(left, leftLo, leftHi, "__llo", "__lhi")
    val r = banded(right, rightLo, rightHi, "__rlo", "__rhi")
    l.join(r, Seq("__bucket"))
      .where(col("__llo") < col("__rhi") && col("__rlo") < col("__lhi") &&
        col("__bucket") === floor(greatest(col("__llo"), col("__rlo")) / bucketWidth))
      .drop("__bucket", "__llo", "__lhi", "__rlo", "__rhi")
  }
}
