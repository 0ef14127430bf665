package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.stream.Collectors
import scala.jdk.CollectionConverters._

/** Build-identity stamp for gate artifacts (VERDICT r10 item 1).
  *
  * Round 10 produced a `CORRECTNESS` artifact with two red rows on code
  * that re-verifies green at HEAD: a `sbt compile` ran beside a live
  * Verify JVM and swapped `Sketches` bytecode under it mid-run, so the
  * dump mixed pre- and post-commit semantics (the oracle string was the
  * new one, the lazily-loaded class the old one). A red row on correct
  * code — or a green row on wrong code — destroys the artifact's
  * authority in BOTH directions.
  *
  * Fix, two halves:
  *   1. (here) every heavyweight main captures a fingerprint of the
  *      classes directory it is executing from (file count, total bytes,
  *      max mtime) plus the git HEAD SHA, re-checks it around every
  *      entry, and ABORTS the run (nonzero exit, tainted output deleted)
  *      the moment the fingerprint moves — a torn run can no longer emit
  *      rows that look authoritative.
  *   2. (build.sbt `lockGuard`) `sbt compile`/`test` block on the
  *      [[RunLock]] flock, so a compile cannot start while a locked
  *      Verify/Bench JVM is live in the first place.
  */
object BuildFingerprint {

  final case class FP(gitSha: String, files: Int, bytes: Long, maxMtime: Long) {
    /** Stable one-line rendering for dumps and error messages. */
    def render: String = s"$gitSha files=$files bytes=$bytes maxMtime=$maxMtime"
    def json: String =
      s"""{"git_sha":"$gitSha","class_files":$files,"class_bytes":$bytes,"classes_max_mtime_ms":$maxMtime}"""
    /** Equality that matters for "did the code move under me": the git SHA
      * is informational (a run from a dirty tree is fine); the classes
      * tree is the load-bearing part. */
    def sameClasses(other: FP): Boolean =
      files == other.files && bytes == other.bytes && maxMtime == other.maxMtime
  }

  /** The directory this very JVM loads graft classes from. */
  def classesDir: Path = {
    val src = getClass.getProtectionDomain.getCodeSource
    require(src != null && src.getLocation != null,
      "cannot locate graft classes directory for fingerprinting")
    Paths.get(src.getLocation.toURI)
  }

  private def gitSha(start: Path): String = {
    // walk up to the repo root; read HEAD without spawning a process
    var dir = start.toAbsolutePath
    while (dir != null && !Files.isDirectory(dir.resolve(".git"))) dir = dir.getParent
    if (dir == null) return "unknown"
    try {
      val head = Files.readString(dir.resolve(".git/HEAD")).trim
      if (head.startsWith("ref: ")) {
        val ref = head.stripPrefix("ref: ").trim
        val refFile = dir.resolve(".git").resolve(ref)
        if (Files.exists(refFile)) Files.readString(refFile).trim
        else { // packed ref
          val packed = dir.resolve(".git/packed-refs")
          if (!Files.exists(packed)) "unknown"
          else Files.readAllLines(packed).asScala
            .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
            .map(_.split(" ")(0)).getOrElse("unknown")
        }
      } else head
    } catch { case _: Exception => "unknown" }
  }

  /** Walk the classes tree (448 files / ~4 MB at round 11 — sub-ms). */
  def compute(): FP = {
    val root = classesDir
    val files = Files.walk(root).collect(Collectors.toList[Path]).asScala
      .filter(Files.isRegularFile(_))
    var bytes = 0L; var maxM = 0L
    files.foreach { p =>
      bytes += Files.size(p)
      val m = Files.getLastModifiedTime(p).toMillis
      if (m > maxM) maxM = m
    }
    FP(gitSha(root), files.size, bytes, maxM)
  }

  /** Recompute and compare; on drift print a loud diagnostic and exit(3)
    * after running `cleanup` (delete tainted output so nothing half-written
    * survives to be read as authoritative). */
  def check(baseline: FP, tag: String)(cleanup: => Unit): Unit = {
    val now = compute()
    if (!now.sameClasses(baseline)) {
      System.err.println(
        s"""[$tag] FATAL: build fingerprint moved mid-run — classes were
           |  recompiled under this JVM (the r10 stale-class race).
           |  started with: ${baseline.render}
           |  now:          ${now.render}
           |  Aborting; output deleted. Re-run after the compile finishes.""".stripMargin)
      cleanup
      sys.exit(3)
    }
  }
}
