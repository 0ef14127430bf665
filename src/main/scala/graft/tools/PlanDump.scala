package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of named gate entries (PLANS.md
  * source). Usage: tools/run.sh graft.tools.PlanDump <sfDir> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
