package graft

import graft.config.ConfigParser
import graft.sources.FileSource
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class FileSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val stream = ConfigParser.parseStream(
    """{"name":"f","sql":"-","key_properties":["id"],
      |"columns":[{"name":"id","type":"bigint"},{"name":"label","type":"text","nullable":true},
      |{"name":"score","type":"double","nullable":true}]}""".stripMargin)

  test("csv/json/parquet/orc round-trip with declared schema (no inference)") {
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "label", "score")
    for (fmt <- Seq("csv", "json", "parquet", "orc")) {
      val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/data"
      FileSource.write(df, fmt, dir)
      val back = FileSource.read(spark, fmt, dir, stream)
      assert(back.schema.fieldNames.toSeq === Seq("id", "label", "score"), fmt)
      val rows = back.as[(Long, String, Double)].collect().sortBy(_._1)
      assert(rows.toSeq === Seq((1L, "a", 0.5), (2L, "b", 1.5)), fmt)
    }
  }

  test("unsupported format is rejected") {
    assertThrows[IllegalArgumentException](
      FileSource.read(spark, "avro", "/tmp/x", stream))
  }
}
