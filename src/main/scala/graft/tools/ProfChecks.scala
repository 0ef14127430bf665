package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfChecks {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val P = graft.functions.Profiling
    val o = Tables.read(spark, dir, "orders")
    val base = o.unionByName(o.where(col("o_orderkey") % 41 === 6))
    val corrupted = base
      .withColumn("o_custkey",
        when(col("o_orderkey") % 31 === 3, lit(null).cast("long"))
          .when(col("o_orderkey") % 29 === 8, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 37 === 5, lit("X")).otherwise(col("o_orderstatus")))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warmup")(spark.range(100).count())
    time("notnull")(P.checkNotNull(corrupted, "orders", "o_custkey").collect())
    time("unique")(P.checkUnique(corrupted, "orders", "o_orderkey").collect())
    time("accepted")(P.checkAcceptedValues(corrupted, "orders", "o_orderstatus", Seq("O","F","P")).collect())
    time("ref")(P.checkRefIntegrity(corrupted, "orders", "o_custkey", Tables.read(spark, dir, "customer"), "c_custkey").collect())
    val qty = Tables.read(spark, dir, "lineitem").select((col("l_quantity").cast("long") + when(col("l_orderkey") % 43 === 7, 100L).otherwise(0L)).as("qty"))
    time("range")(P.checkRange(qty, "lineitem", "qty", 1L, 50L).collect())
    time("full_entry")(graft.SparkEntry.queries("table_checks")(spark, dir).collect())
    time("full_entry2")(graft.SparkEntry.queries("table_checks")(spark, dir).collect())
    spark.stop()
  }
}
