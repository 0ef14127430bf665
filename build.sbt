ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "youcruittaprawpostgresqlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Compile-side half of the r10 stale-class fix (VERDICT r10 item 1): a
// `sbt compile` that runs while a Verify/Bench JVM is live can swap
// bytecode under the run's lazily-loaded classes (observed: two correct
// count-min entries graded red in CORRECTNESS_r10). Heavy runs hold an
// exclusive flock on /tmp/graft-spark.lock (tools/RunLock); compile now
// BLOCKS on that same lock before touching classes, then releases it so
// the actual run can start. GRAFT_NO_LOCK=1 opts out.
lazy val lockGuard = taskKey[Unit](
  "block while a graft Verify/Bench JVM holds the run lock")
lockGuard := {
  if (!sys.env.contains("GRAFT_NO_LOCK")) {
    val path = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_LOCK_FILE", "/tmp/graft-spark.lock"))
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val tryL = ch.tryLock()
      val l = if (tryL != null) tryL else {
        sLog.value.warn(s"[compile] waiting on $path — a graft run is live")
        ch.lock() // blocks until the running JVM exits
      }
      l.release()
    } finally ch.close()
  }
}
Compile / compile := ((Compile / compile) dependsOn lockGuard).value
Test / compile := ((Test / compile) dependsOn lockGuard).value
// Pass forked-run output through unprefixed: the bench/verify harness
// scrapes stdout for the one-line metrics JSON, and sbt's default
// LoggedOutput would wrap it as "[info] {...}" (and tag all Spark stderr
// as "[error]"), defeating a plain json.loads on the tail line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
