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
    swap(fs, src, tmp)
    (before, countDataFiles(fs, src))
  }

  /** Compact only FRAGMENTED partitions: every `partitionCol=value`
    * directory holding at least `minFiles` data files is rewritten as
    * one file (distinct rows); partitions below the threshold are not
    * touched at all — their files keep their names, nothing is read.
    * The swap is per-partition, so maintenance cost is bounded by the
    * fragmented fraction of the index, not its total size — the
    * steady-state cadence form for huge indexes where full [[compact]]
    * would be a corpus-sized job. Returns (filesBefore, filesAfter)
    * over the whole layout.
    */
  def compactFragmented(spark: SparkSession, path: String,
                        partitionCol: String,
                        minFiles: Int = 2): (Long, Long) = {
    require(minFiles >= 2, s"minFiles must be >= 2, got $minFiles")
    val src = new HadoopPath(path)
    val fs: FileSystem =
      src.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(src).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
    var before = 0L
    var after = 0L
    parts.foreach { p =>
      val n = countDataFiles(fs, p.getPath)
      before += n
      if (n >= minFiles) {
        // reading the partition directory directly drops the partition
        // column from the rows — exactly right: the rewritten files go
        // back under the same `col=value` directory, which carries the
        // value at read time just as the original layout did
        val df = spark.read.parquet(p.getPath.toString).distinct()
        val tmp = new HadoopPath(p.getPath.toString + ".compact-tmp")
        df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
        swap(fs, p.getPath, tmp)
        after += countDataFiles(fs, p.getPath)
      } else after += n
    }
    (before, after)
  }

  /** Swap `tmp` into `dst`: keep the old layout until the replacement
    * is fully written, so a crash leaves either the old or the new
    * index, never neither.
    */
  private def swap(fs: FileSystem, dst: HadoopPath, tmp: HadoopPath): Unit = {
    val old = new HadoopPath(dst.toString + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compact: cannot move $dst aside")
    if (!fs.rename(tmp, dst)) {
      fs.rename(old, dst) // roll back
      throw new java.io.IOException(s"compact: cannot install $tmp")
    }
    fs.delete(old, true)
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

  /** Re-pack a flat retrieval postings index ([[Retrieval.appendPostings]]
    * accumulation). Postings rows are unique per (term, doc) by
    * construction, so the distinct pass is a no-op on correct data and
    * heals a double-submitted batch; BM25 stats re-derive at search time,
    * so scores are unchanged by contract (spec-pinned).
    */
  def compactPostings(spark: SparkSession, path: String,
                      targetFiles: Int = 1): (Long, Long) =
    compact(spark, path, None, targetFiles)

  /** Shuffle-FREE compaction of a term-bucketed postings index
    * ([[Retrieval.appendPostingsBucketed]] accumulation): each
    * `bucket=` partition's files merge through one `coalesce(1)` read
    * → rewrite → atomic per-partition swap — no exchange anywhere,
    * because the append already placed every term's rows in one bucket
    * and postings rows are unique per (term, doc) by the append
    * contract (batch doc ids are new), so there is nothing to
    * de-duplicate or re-cluster (VERDICT r10 item 4; append ≡ rebuild
    * spec-pinned). A double-submitted batch needs the healing
    * [[compactPostings]] distinct instead — this is the fast path for
    * the normal cadence. Buckets compact independently: at production
    * scale run them as concurrent jobs; cost is bounded by the touched
    * bucket's size, never the index's.
    */
  def compactPostingsBucketed(spark: SparkSession,
                              path: String): (Long, Long) = {
    val src = new HadoopPath(path)
    val fs: FileSystem =
      src.getFileSystem(spark.sessionState.newHadoopConf())
    // the doc-length sidecar accumulates one small file per append —
    // fold it into the same maintenance pass
    val sidecar = new HadoopPath(
      graft.functions.Retrieval.doclensPath(path))
    val parts = fs.listStatus(src).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("bucket=")) ++
      (if (fs.exists(sidecar)) Seq(fs.getFileStatus(sidecar)) else Nil)
    // buckets compact CONCURRENTLY — each rewrite is one single-task
    // Spark job (the coalesce(1) read), so a sequential driver loop
    // would leave the cluster idle; Spark schedules jobs from multiple
    // threads fine. Parallelism is bounded by the bucket count.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = parts.map { p => Future {
      val n = countDataFiles(fs, p.getPath)
      if (n >= 2) {
        // reading the partition dir drops the bucket column from the
        // rows — right, the rewritten files return under the same
        // `bucket=` directory (same note as compactFragmented)
        val df = spark.read.parquet(p.getPath.toString).coalesce(1)
        val tmp = new HadoopPath(p.getPath.toString + ".compact-tmp")
        df.write.mode("overwrite").parquet(tmp.toString)
        swap(fs, p.getPath, tmp)
        (n, countDataFiles(fs, p.getPath))
      } else (n, n)
    }}.map(Await.result(_, Duration.Inf))
    (results.map(_._1).sum, results.map(_._2).sum)
  }

  /** Merge-rewrite an appended Bloom skipping index
    * ([[Layout.appendBloomIndex]] accumulation): unlike the distinct-
    * based compactions, shards carrying DIFFERENT bits for one
    * (bucket, word) must fold by `bit_or` — a distinct pass would keep
    * both rows and double the probe join's fanout. Prune decisions are
    * unchanged by contract (load folds identically; spec-pinned).
    */
  def compactBloomIndex(spark: SparkSession, path: String,
                        targetFiles: Int = 1): (Long, Long) = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val src = new HadoopPath(path)
    val fs: FileSystem =
      src.getFileSystem(spark.sessionState.newHadoopConf())
    val before = countDataFiles(fs, src)
    val df = spark.read.parquet(path)
      .groupBy("bucket", "word")
      .agg(org.apache.spark.sql.functions.expr("bit_or(bits)").as("bits"))
    val tmp = new HadoopPath(path + ".compact-tmp")
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    swap(fs, src, tmp)
    (before, countDataFiles(fs, src))
  }

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
