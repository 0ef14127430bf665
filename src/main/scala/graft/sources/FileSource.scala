package graft.sources

import graft.config.StreamConfig
import graft.operators.Conformance
import graft.types.TypeMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-based stream sources: the engine's generalization of the
  * reference's single source (PostgreSQL) to the formats a Spark pipeline
  * ingests — parquet, csv, json, orc. The declared stream schema drives
  * the reader (no sampling-based inference, so a 100 TB json/csv read
  * skips the schema-inference pass entirely), and conformance applies the
  * same declared-column projection/cast as the SQL paths.
  */
object FileSource {

  val Formats: Set[String] = Set("parquet", "csv", "json", "orc")

  def read(spark: SparkSession, format: String, path: String,
           stream: StreamConfig,
           options: Map[String, String] = Map.empty): DataFrame = {
    require(Formats.contains(format), s"unsupported file format: $format")
    val schema = TypeMapper.structType(stream.columns)
    val reader = spark.read.options(options)
    val df = format match {
      case "parquet" => reader.parquet(path) // parquet carries its own schema
      case "orc" => reader.orc(path)
      case "csv" => reader.schema(schema).option("header", "true").csv(path)
      case "json" => reader.schema(schema).json(path)
    }
    Conformance.conform(df, stream.columns)
  }

  /** Write a DataFrame in any supported format (the sink mirror). */
  def write(df: DataFrame, format: String, path: String,
            options: Map[String, String] = Map.empty): Unit = {
    require(Formats.contains(format), s"unsupported file format: $format")
    val writer = df.write.options(options).mode("overwrite")
    format match {
      case "parquet" => writer.parquet(path)
      case "orc" => writer.orc(path)
      case "csv" => writer.option("header", "true").csv(path)
      case "json" => writer.json(path)
    }
  }
}
