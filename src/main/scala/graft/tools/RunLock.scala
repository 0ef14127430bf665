package graft.tools

/** Cross-JVM serialization of heavyweight Spark runs (VERDICT r9 item 6):
  * BENCH_r09's driver totals ran alongside other suite JVMs (239.9 s vs
  * 212.5 s isolated), and a 10× gate chunk once failed under three
  * concurrent Spark JVMs (memory contention). Every heavyweight main
  * (Bench, Verify, ScaleUp) takes a blocking exclusive flock on one
  * well-known file before touching Spark, so concurrent invocations
  * serialize instead of contaminating each other's numbers — the bench
  * artifact IS the clean number.
  *
  * Child JVMs spawned BY a lock holder inherit `GRAFT_LOCK_HELD` and skip
  * re-acquisition (no self-deadlock); `GRAFT_NO_LOCK=1` opts out (e.g. a
  * deliberate contention experiment). The lock is held until JVM exit —
  * the OS releases a flock with its process, so a killed run never
  * wedges the queue.
  */
object RunLock {

  // STRONG references to the channel + lock. An unreferenced FileChannel
  // is garbage-collected, and channel finalization RELEASES its file
  // locks — the original acquire() dropped both on the floor, so the
  // "held for JVM life" lock actually lasted until the first full GC
  // (observed round 11: an sbt compile sailed straight through lockGuard
  // while a 200-entries-deep Verify was live; the fingerprint guard
  // caught the resulting class swap and aborted the run).
  @volatile private var held: Option[
    (java.nio.channels.FileChannel, java.nio.channels.FileLock)] = None

  def acquire(tag: String): Unit = {
    if (sys.env.contains("GRAFT_LOCK_HELD") ||
        sys.env.contains("GRAFT_NO_LOCK")) return
    if (held.isDefined) return // idempotent within one JVM
    val path = sys.env.getOrElse("GRAFT_LOCK_FILE", "/tmp/graft-spark.lock")
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = {
      val t = ch.tryLock()
      if (t != null) t
      else {
        System.err.println(
          s"[$tag] waiting on $path — another graft JVM is running")
        val l = ch.lock() // blocks until the holder exits
        System.err.println(s"[$tag] lock acquired, starting")
        l
      }
    }
    held = Some((ch, lock)) // pinned until JVM exit; OS releases on death
  }
}
