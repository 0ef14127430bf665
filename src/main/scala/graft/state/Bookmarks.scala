package graft.state

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import graft.config.{ReplicationMethod, StreamConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Singer-style state: one bookmark (last replication-key value) per stream,
  * persisted as JSON, enabling resumable incremental extraction.
  *
  * Reference: `STATE` capability at tap_rawpostgresql/tap.py:253; bookmark
  * read-back at client.py:272; precedence semantics at client.py:260-298.
  */
final case class TapState(bookmarks: Map[String, String]) {
  def bookmark(streamId: String): Option[String] = bookmarks.get(streamId)
  def advanced(streamId: String, value: String): TapState =
    TapState(bookmarks + (streamId -> value))
}

object Bookmarks {
  private val mapper = new ObjectMapper()

  def empty: TapState = TapState(Map.empty)

  def load(path: String): TapState = {
    val p = Paths.get(path)
    if (!Files.exists(p)) empty
    else {
      val n = mapper.readTree(Files.readString(p))
      val bm = Option(n.get("bookmarks")).map { b =>
        b.properties().asScala.map { e =>
          val v = Option(e.getValue.get("replication_key_value"))
            .map(_.asText).getOrElse("")
          e.getKey -> v
        }.toMap
      }.getOrElse(Map.empty[String, String])
      TapState(bm.filter(_._2.nonEmpty))
    }
  }

  def save(path: String, state: TapState, streams: Seq[StreamConfig]): Unit = {
    val repKeyByStream = streams.map(s => s.streamId -> s.replicationKey).toMap
    val f = JsonNodeFactory.instance
    val bookmarks = f.objectNode()
    state.bookmarks.foreach { case (sid, v) =>
      val entry = f.objectNode()
      repKeyByStream.get(sid).flatten.foreach(k => entry.put("replication_key", k))
      entry.put("replication_key_value", v)
      bookmarks.set[com.fasterxml.jackson.databind.JsonNode](sid, entry)
    }
    val root = f.objectNode()
    root.set[com.fasterxml.jackson.databind.JsonNode]("bookmarks", bookmarks)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Resolve the starting replication-key value for a stream run.
    *
    * INCREMENTAL: state bookmark first, then `replication_key_value_start`,
    * else error (reference: client.py:266-283; precedence §2.4.3).
    * FULL_TABLE whose SQL still binds `:rep_key_val`: the start value is
    * REQUIRED — state is ignored (reference: client.py:284-298; §2.4.2).
    */
  def resolveStart(stream: StreamConfig, state: TapState): Option[String] = {
    val usesParam = stream.sql.contains(":rep_key_val")
    stream.replicationMethod match {
      case ReplicationMethod.Incremental =>
        val v = state.bookmark(stream.streamId).orElse(stream.replicationKeyValueStart)
        if (v.isEmpty)
          throw new IllegalStateException(
            s"stream '${stream.name}' is INCREMENTAL but has no state bookmark " +
              "and no replication_key_value_start")
        v
      case ReplicationMethod.FullTable if usesParam =>
        val v = stream.replicationKeyValueStart
        if (v.isEmpty)
          throw new IllegalStateException(
            s"stream '${stream.name}' is FULL_TABLE but its SQL binds " +
              ":rep_key_val and no replication_key_value_start is configured")
        v
      case _ => None
    }
  }

  /** New bookmark after a sync: max replication-key value in the result.
    * Distributed single-row aggregate — no driver-side iteration.
    */
  def advance(stream: StreamConfig, result: DataFrame, state: TapState): TapState =
    stream.replicationKey match {
      case Some(k) =>
        val row = result.agg(max(col(k)).cast("string")).head()
        if (row.isNullAt(0)) state
        else state.advanced(stream.streamId, row.getString(0))
      case None => state
    }
}
