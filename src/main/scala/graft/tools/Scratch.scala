package graft.tools

import java.nio.file.{Files, Path, Paths}

/** Run-scoped scratch directories for entries that persist an index, a
  * trained model, or a register shard mid-plan and read it back (the
  * incremental/ingest family: `events_hll_incremental`, `sim_ivfpq_*`,
  * `text_lm_score`, `dedup_semantic_*`, ...).
  *
  * Contract (ADVICE r8): the default root is a DRIVER-LOCAL temp
  * directory, which is only correct in local mode, where executors share
  * the driver's filesystem. On a real cluster, point `SPARK_GRAFT_SCRATCH`
  * at a path on a shared filesystem (HDFS / s3a / NFS) — executors cannot
  * read the driver's `/tmp`. Every directory handed out here is deleted on
  * JVM exit, so repeated bench/gate runs do not accumulate orphaned shards.
  */
object Scratch {

  private lazy val root: Path = sys.env.get("SPARK_GRAFT_SCRATCH")
    .map(r => Files.createDirectories(Paths.get(r)))
    .getOrElse(Files.createTempDirectory("graft_scratch"))

  private val created = scala.collection.mutable.ListBuffer.empty[Path]

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => created.synchronized {
      created.foreach(p => delete(p.toFile))
    }))

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(); ()
  }

  /** A fresh subdirectory under the run root; removed at JVM exit. Only
    * the subdirectory is deleted — a caller-provided `SPARK_GRAFT_SCRATCH`
    * root is never touched.
    */
  def dir(tag: String): String = {
    hook
    val p = Files.createTempDirectory(root, tag)
    created.synchronized { created += p }
    p.toString
  }
}
