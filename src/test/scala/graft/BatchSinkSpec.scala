package graft

import graft.config.{BatchConfig, BatchEncoding, BatchStorage, ConfigParser}
import graft.sinks.BatchSink
import graft.sources.StreamSource
import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** F4 batch round-trip: gzip JSONL, rotation at batch_size, filename
  * scheme, and the exact UUID/timestamp serialization forms
  * (reference: tests/test_postgres.py:175-203).
  */
/** A local filesystem registered under a non-`file:` scheme — the standard
  * Hadoop-test trick for exercising scheme resolution without a real
  * object store.
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

class BatchSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def gunzipLines(path: String): Seq[String] = {
    val in = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(Files.newInputStream(Paths.get(path))), "UTF-8"))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toList
    finally in.close()
  }

  test("F4 uuid + timestamptz serialization round-trip") {
    val tmp = Files.createTempDirectory("graft-batch").toString
    val s = ConfigParser.parseStream(
      """{"name":"test","sql":"SELECT '1441c21d-9921-4a1d-b239-9c6ea18af234'::uuid as id, timestamptz '2021-11-22T11:45:11.062824+00:00' as last_updated",
        |"key_properties":["id"],"batch_size":5,
        |"columns":[{"name":"id","type":"string"},{"name":"last_updated","type":"datetime"}]}""".stripMargin)
    val df = StreamSource.native(spark, s)
    val manifests = BatchSink.write(df, s,
      BatchConfig(BatchEncoding("jsonl", "gzip"), BatchStorage(s"file://$tmp")))
    assert(manifests.nonEmpty)
    val file = Paths.get(java.net.URI.create(manifests.head.files.head))
    assert(file.getFileName.toString.matches(
      "tap-rawpostgresql--test-[0-9a-f-]{36}-0\\.json\\.gz"))
    val lines = gunzipLines(file.toString)
    assert(lines.length === 1)
    assert(lines.head.contains(""""id":"1441c21d-9921-4a1d-b239-9c6ea18af234""""))
    assert(lines.head.contains(""""last_updated":"2021-11-22T11:45:11.062824+00:00""""))
  }

  // Object-store readiness: the sink resolves its root through the Hadoop
  // FileSystem API, so any configured scheme works (s3a://, gs://, …).
  // Exercised with a registered non-`file:` scheme backed by
  // RawLocalFileSystem — write, rotation-rename, and manifest URLs must
  // all go through that filesystem, not java.nio.
  test("batch root on a non-file filesystem scheme") {
    val tmp = Files.createTempDirectory("graft-batch-mockfs").toString
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val s = ConfigParser.parseStream(
      """{"name":"obj","sql":"SELECT id FROM range(0, 7)","key_properties":["id"],"batch_size":4,
        |"columns":[{"name":"id","type":"bigint"}]}""".stripMargin)
    val df = StreamSource.native(spark, s).coalesce(1)
    val manifests = BatchSink.write(df, s,
      BatchConfig(BatchEncoding("jsonl", "gzip"), BatchStorage(s"mockfs://$tmp")))
    assert(manifests.length === 2) // 7 records, batch_size 4 → 4/3
    assert(manifests.forall(_.files.head.startsWith("mockfs:")))
    val counts = manifests.map { m =>
      val local = new java.net.URI(m.files.head).getPath
      gunzipLines(local).length
    }
    assert(counts.sorted === Seq(3, 4))
  }

  test("rotation at batch_size with remainder flush") {
    val tmp = Files.createTempDirectory("graft-batch").toString
    val s = ConfigParser.parseStream(
      """{"name":"rot","sql":"SELECT id FROM range(0, 12)","key_properties":["id"],"batch_size":5,
        |"columns":[{"name":"id","type":"bigint"}]}""".stripMargin)
    val df = StreamSource.native(spark, s).coalesce(1)
    val manifests = BatchSink.write(df, s,
      BatchConfig(BatchEncoding("jsonl", "gzip"), BatchStorage(s"file://$tmp")))
    // 12 records, batch_size 5 → 3 chunk files (5/5/2), one manifest each
    assert(manifests.length === 3)
    val counts = manifests.map(m =>
      gunzipLines(Paths.get(java.net.URI.create(m.files.head)).toString).length)
    assert(counts.sorted === Seq(2, 5, 5))
    val total = Files.list(Paths.get(tmp)).iterator.asScala
      .count(_.getFileName.toString.endsWith(".json.gz"))
    assert(total === 3)
  }
}
