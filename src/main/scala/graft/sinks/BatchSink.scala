package graft.sinks

import graft.config.{BatchConfig, StreamConfig}
import graft.operators.Conformance
import org.apache.spark.sql.DataFrame
import java.net.URI
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** One emitted batch manifest: encoding + the files of one chunk
  * (reference: tap_rawpostgresql/client.py:234,245 yields
  * `(encoding, [file_url])` per chunk).
  */
final case class BatchManifest(format: String, compression: String, files: Seq[String])

/** Batch sink: gzip-compressed JSONL files of at most `batchSize` records,
  * named `{prefix}{tap}--{stream}-{uuid4}-{i}.json.gz`.
  *
  * Reference: tap_rawpostgresql/client.py:185-245 — rotation at exactly
  * `batch_size` records (client.py:228-239), final flush (client.py:241-245),
  * filename scheme (client.py:202,214).
  *
  * Spark-first: the write itself is `DataFrameWriter.json` with
  * `maxRecordsPerFile` — rotation and parallel IO are native and scale with
  * partitions, unlike the reference's single sequential writer. File
  * renaming to the reference scheme is a cheap driver-side metadata pass.
  */
object BatchSink {

  def write(df: DataFrame, stream: StreamConfig, batch: BatchConfig,
            tapName: String = "tap-rawpostgresql"): Seq[BatchManifest] = {
    require(batch.encoding.format == "jsonl",
      s"unsupported batch format: ${batch.encoding.format}")
    // Normalize before reporting: anything other than gzip writes plain
    // .json, and the manifest must say what was actually applied.
    val gzip = batch.encoding.compression == "gzip"
    val appliedCompression = if (gzip) "gzip" else "none"
    val root = Paths.get(URI.create(
      if (batch.storage.root.contains(":")) batch.storage.root
      else s"file://${batch.storage.root}"))
    Files.createDirectories(root)
    val outDir = root.resolve(s"graft-batch-${UUID.randomUUID()}")

    val writer = df.write
      .option("maxRecordsPerFile", stream.batchSize.toString)
      .option("timestampFormat", Conformance.IsoTimestampPattern)
    (if (gzip) writer.option("compression", "gzip") else writer)
      .json(outDir.toString)

    val ext = if (gzip) ".json.gz" else ".json"
    val parts = scala.util.Using.resource(Files.list(outDir)) { s =>
      s.iterator.asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(ext))
        .toSeq
    }.sortBy(_.getFileName.toString)

    val syncId = UUID.randomUUID().toString
    val renamed: Seq[Path] = parts.zipWithIndex.map { case (p, i) =>
      val name = s"${batch.storage.prefix}$tapName--${stream.name}-$syncId-$i$ext"
      val target = root.resolve(name)
      Files.move(p, target)
      target
    }
    Files.deleteIfExists(outDir.resolve("_SUCCESS"))
    scala.util.Using.resource(Files.list(outDir)) { s =>
      s.iterator.asScala.toSeq
    }.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(outDir)

    // one manifest per chunk file, matching the reference's per-chunk yield
    renamed.map(p => BatchManifest(batch.encoding.format,
      appliedCompression, Seq(p.toUri.toString)))
  }
}
