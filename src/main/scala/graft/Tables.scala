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
      // Fixture generations have carried events.ts as parquet
      // TIMESTAMP(NANOS) (Spark 4 rejects it — PARQUET_TYPE_ILLEGAL —
      // so read nanos as Long and truncate to µs), TIMESTAMP(MICROS)
      // without UTC adjustment (arrives as TimestampNTZType), or
      // Spark-rewritten TIMESTAMP(MICROS) instant (ScaleUp dirs,
      // TimestampType already). Normalize ALL of them to a microsecond
      // TimestampType on the observed schema so every downstream
      // consumer — typed encoders with java.sql.Timestamp fields,
      // sentinel unions in the streaming gate entries — sees one type.
      // Session timezone is UTC everywhere (Verify/Bench/tests), so the
      // NTZ→instant cast preserves wall-clock values and DuckDB-side
      // oracles (which read the file natively) agree on any
      // second-or-coarser derivation of ts.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(sfDir, name))
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(path(sfDir, name))

  /** Register every fixture table as a temp view (idempotent). */
  def register(spark: SparkSession, sfDir: String): Unit =
    All.foreach { t =>
      read(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
