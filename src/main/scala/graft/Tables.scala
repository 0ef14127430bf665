package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-fixture table registry: registers the driver-generated parquet
  * tables under a scale-factor directory as temp views so stream SQL and
  * `SparkEntry.queries` can reference them by bare name (matching the
  * DuckDB oracle's table names).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver fixtures carry events.ts as parquet TIMESTAMP(NANOS),
      // which Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) — read
      // nanos as Long and truncate to a microsecond TimestampType
      // (matching Spark's own pre-4.x behavior). ScaleUp-derived dirs are
      // re-written by Spark itself as TIMESTAMP(MICROS), so the column
      // arrives as TimestampType already — adapt on the observed schema.
      // DuckDB keeps ns on the fixtures, so oracle-checked queries must
      // only use second-or-coarser derivations of ts.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(sfDir, name))
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        case _ => df
      }
    } else spark.read.parquet(path(sfDir, name))

  /** Register every fixture table as a temp view (idempotent). */
  def register(spark: SparkSession, sfDir: String): Unit =
    All.foreach { t =>
      read(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
