package graft.sinks

import graft.config.StreamConfig
import graft.operators.Conformance
import graft.state.TapState
import graft.types.TypeMapper
import org.apache.spark.sql.DataFrame
import java.io.PrintStream

/** Singer protocol emission: SCHEMA, then RECORDs, then STATE, one JSON
  * object per stdout line (inherited behavior of `singer_sdk.Stream.sync`;
  * reference invocation at tap_rawpostgresql/client.py:212).
  *
  * Message serialization is inherently a driver-side, ordered, line-oriented
  * concern (the Singer spec is a stdout pipe), so this is the one place the
  * engine iterates rows on the driver — via `toLocalIterator`, which holds
  * at most one partition in memory, mirroring the reference's O(1)
  * generator streaming (client.py:247-304).
  */
object SingerSink {

  /** `schemaJson` overrides the declared-columns schema document — used
    * when a stream map changed the emitted shape (the SDK likewise
    * regenerates SCHEMA from the transformed records).
    */
  def emitSchema(stream: StreamConfig, out: PrintStream = System.out,
                 schemaJson: Option[String] = None): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val keys = stream.keyProperties.map(q).mkString("[", ",", "]")
    val bookmark = stream.replicationKey.map(k => s",\"bookmark_properties\":[${q(k)}]").getOrElse("")
    val schema = schemaJson.getOrElse(TypeMapper.jsonSchema(stream))
    out.println(
      s"""{"type":"SCHEMA","stream":${q(stream.name)},"schema":$schema,"key_properties":$keys$bookmark}""")
  }

  /** Emit RECORD messages. The DataFrame's JSON encoding happens
    * distributed (executor-side `to_json`); only the enveloped lines stream
    * through the driver. `ignoreNullFields=false` so null-valued columns
    * appear as explicit JSON nulls — `df.toJSON` would drop them, but the
    * reference/singer_sdk emits every declared column in each RECORD and
    * strict Singer targets check schema parity.
    *
    * Returns (records emitted, max replication-key value among them as its
    * Spark string cast). The bookmark is tracked INSIDE the single emit
    * pass — the rep key rides alongside each JSON line (natively, for
    * type-correct ordering; numbers must not compare lexicographically) —
    * so the stream is executed exactly once: no second max() job that a
    * nondeterministic source could answer differently, and no
    * full-stream persist to keep the two executions consistent
    * (singer_sdk likewise derives state from processed records). O(1)
    * driver state; `toLocalIterator` holds at most one partition.
    *
    * `onProgress` fires after every `stateEvery` emitted records with the
    * max replication-key string among records emitted SO FAR — the caller
    * turns it into a mid-sync STATE message (the SDK's
    * `Tap.STATE_MSG_FREQUENCY` behavior), so a 100 TB extraction killed
    * mid-stream resumes from the last flushed bookmark.
    */
  def emitRecords(df: DataFrame, stream: StreamConfig,
                  out: PrintStream = System.out,
                  timeExtracted: Option[String] = None,
                  stateEvery: Long = Long.MaxValue,
                  onProgress: Option[String] => Unit = _ => ()): (Long, Option[String]) = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val jsonCol = to_json(struct(Conformance.temporalExprs(df): _*),
      java.util.Map.of("ignoreNullFields", "false"))
    val projected = stream.replicationKey match {
      // cast BEFORE the max is picked, but argmax(native) then its string
      // == cast(max(native)): same bookmark rendering Bookmarks.advance
      // produced from a whole-column max
      case Some(k) => df.select(jsonCol.as("j"),
        col(k).as("rk"), col(k).cast("string").as("rks"))
      case None => df.select(jsonCol.as("j"))
    }
    var n = 0L
    // singer_sdk stamps each RECORD with time_extracted (ISO8601 UTC);
    // one timestamp per sync — resolved by the caller so tests stay
    // deterministic and all of a stream's records agree
    val te = timeExtracted
      .map(t => s""","time_extracted":"$t"""").getOrElse("")
    val prefix = s"""{"type":"RECORD","stream":"${stream.name}","record":"""
    val hasRk = stream.replicationKey.isDefined
    var best: AnyRef = null
    var bestStr: String = null
    val it = projected.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      out.println(prefix + row.getString(0) + te + "}")
      if (hasRk && !row.isNullAt(1)) {
        // external types of the supported rep-key types compare
        // consistently with Spark's max() ordering — except String, whose
        // compareTo is UTF-16 code-unit order while Spark orders UTF-8
        // bytes (code points); route strings through UTF8String so the
        // Singer bookmark agrees with the batch-mode Bookmarks.advance
        // max() on supplementary-plane values
        val v = row.get(1) match {
          case s: String =>
            org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case other => other.asInstanceOf[AnyRef]
        }
        if (best == null ||
            v.asInstanceOf[Comparable[AnyRef]].compareTo(best) > 0) {
          best = v
          bestStr = row.getString(2)
        }
      }
      n += 1
      if (n % stateEvery == 0) onProgress(Option(bestStr))
    }
    (n, Option(bestStr))
  }

  /** One Singer BATCH message per emitted manifest (the SDK's
    * `BatchMessage`; the reference yields one `(encoding, [file_url])`
    * chunk at a time, client.py:234,245).
    */
  /** `ACTIVATE_VERSION` — the singer_sdk FULL_TABLE resync handshake: a
    * version stamp emitted after the sync's last RECORD tells a
    * version-aware target that rows not carrying this version are stale
    * and may be hard-deleted (soft "truncate then reload" without a
    * window where the table is empty). Incremental streams never emit
    * it — their bookmark IS the freshness contract.
    */
  def emitActivateVersion(stream: StreamConfig, version: Long,
                          out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    out.println(
      s"""{"type":"ACTIVATE_VERSION","stream":${q(stream.name)},"version":$version}""")
  }

  def emitBatch(stream: StreamConfig, manifest: BatchManifest,
                out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val files = manifest.files.map(q).mkString("[", ",", "]")
    out.println(s"""{"type":"BATCH","stream":${q(stream.name)},"encoding":{"format":${q(manifest.format)},"compression":${q(manifest.compression)}},"manifest":$files}""")
  }

  def emitState(state: TapState, out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val bms = state.bookmarks.toSeq.sortBy(_._1).map { case (sid, v) =>
      s"${q(sid)}:{${q("replication_key_value")}:${q(v)}}"
    }.mkString("{", ",", "}")
    out.println(s"""{"type":"STATE","value":{"bookmarks":$bms}}""")
  }

  /** Mid-sync STATE for an UNSORTED stream: the active stream's running
    * max rides in `progress_markers` (the SDK's non-resumable marker shape
    * for `is_sorted=False` streams) while its committed
    * `replication_key_value` — what a resume actually filters on — stays
    * untouched. `Bookmarks.load` reads only `replication_key_value`, so an
    * interrupted unsorted sync re-extracts the whole stream (safe: rows
    * below the running max might not have been emitted yet) and the marker
    * is promoted to a real bookmark only when the stream completes.
    */
  def emitStateProgress(state: TapState, streamId: String, repKey: String,
                        value: String, out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val markers = s"${q("progress_markers")}:{${q("Note")}:${q(
      "Progress is not resumable if interrupted.")},${q("replication_key")}:${q(
      repKey)},${q("replication_key_value")}:${q(value)}}"
    val sids = (state.bookmarks.keySet + streamId).toSeq.sorted
    val bms = sids.map { sid =>
      val committed = state.bookmarks.get(sid)
        .map(v => s"${q("replication_key_value")}:${q(v)}")
      val fields = committed.toSeq ++ (if (sid == streamId) Seq(markers) else Nil)
      s"${q(sid)}:{${fields.mkString(",")}}"
    }.mkString("{", ",", "}")
    out.println(s"""{"type":"STATE","value":{"bookmarks":$bms}}""")
  }
}
