package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump a SUBSET of SparkEntry.queries + their oracle SQL — the local
  * fast path for iterating on one entry without the full Verify sweep.
  * Usage: tools/run.sh graft.tools.QuickVerify <sfDir> <outDir> <name>...
  * Then: python3 tools/check.py <sfDir> <outDir>
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // repartition(1), not coalesce(1) — same rationale as graft.Verify
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[quick] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = java.nio.file.Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql.filter(o => names(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__OUT__", outAbs))}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
