package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the persisted incremental indexes (semantic members,
  * ExactSubstr windows, IVF-PQ codes). The append paths deliberately
  * write NEW FILES into the touched partitions on every ingested batch
  * — correct (probes read sets) but accumulative: after many small
  * batches a bucket holds many small files and scan/open overhead grows.
  * Compaction is the slow-cadence counterpart: rewrite a layout as one
  * file per partition (or `targetFiles` for flat layouts) with exact
  * duplicate rows dropped, then atomically swap directories. Probe
  * results are UNCHANGED by contract — every probe is a semi-join /
  * set-scan, so dropping identical rows and re-arranging files is
  * invisible (pinned by IndexMaintenanceSpec for all three layouts).
  *
  * 100 TB shape: the rewrite is one exchange on the partition column
  * (exactly the save-path write) over only this index's data; the swap
  * is two metadata renames. Run it per-partition-subset on a cadence if
  * the full index is too large for one job — the layout is
  * partition-parallel by construction.
  */
object IndexMaintenance {

  /** Compact a parquet index directory in place: distinct rows, one
    * file per `partitionCol` value (or `targetFiles` files when flat),
    * atomic directory swap. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
              partitionCol: Option[String],
              targetFiles: Int = 1): (Long, Long) = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val src = new HadoopPath(path)
    val fs: FileSystem =
      src.getFileSystem(spark.sessionState.newHadoopConf())
    val before = countDataFiles(fs, src)
    val df = spark.read.parquet(path).distinct()
    val tmp = new HadoopPath(path + ".compact-tmp")
    partitionCol match {
      case Some(c) =>
        df.repartition(col(c)).write.mode("overwrite")
          .partitionBy(c).parquet(tmp.toString)
      case None =>
        df.repartition(targetFiles).write.mode("overwrite")
          .parquet(tmp.toString)
    }
    // swap: keep the old layout until the replacement is fully written,
    // so a crash leaves either the old or the new index, never neither
    val old = new HadoopPath(path + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(src, old))
      throw new java.io.IOException(s"compact: cannot move $src aside")
    if (!fs.rename(tmp, src)) {
      fs.rename(old, src) // roll back
      throw new java.io.IOException(s"compact: cannot install $tmp")
    }
    fs.delete(old, true)
    (before, countDataFiles(fs, src))
  }

  /** One file per `bucket=` partition of a saved semantic index. */
  def compactSemanticIndex(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, s"$path/members", Some("bucket"))

  /** One file per `list_id=` partition of a saved IVF-PQ index. */
  def compactIvfPqIndex(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, s"$path/codes", Some("list_id"))

  /** Re-pack a flat ExactSubstr window index into `targetFiles` files
    * (size to ~shuffle-partition count at production scale).
    */
  def compactSubstrIndex(spark: SparkSession, path: String,
                         targetFiles: Int = 1): (Long, Long) =
    compact(spark, path, None, targetFiles)

  private def countDataFiles(fs: FileSystem, dir: HadoopPath): Long = {
    val it = fs.listFiles(dir, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        n += 1
    }
    n
  }
}
