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

  def emitSchema(stream: StreamConfig, out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val keys = stream.keyProperties.map(q).mkString("[", ",", "]")
    val bookmark = stream.replicationKey.map(k => s",\"bookmark_properties\":[${q(k)}]").getOrElse("")
    out.println(
      s"""{"type":"SCHEMA","stream":${q(stream.name)},"schema":${TypeMapper.jsonSchema(stream)},"key_properties":$keys$bookmark}""")
  }

  /** Emit RECORD messages. The DataFrame's JSON encoding happens
    * distributed (executor-side `to_json`); only the enveloped lines stream
    * through the driver. `ignoreNullFields=false` so null-valued columns
    * appear as explicit JSON nulls — `df.toJSON` would drop them, but the
    * reference/singer_sdk emits every declared column in each RECORD and
    * strict Singer targets check schema parity.
    */
  def emitRecords(df: DataFrame, stream: StreamConfig,
                  out: PrintStream = System.out,
                  timeExtracted: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val serialized = Conformance.serializeTemporal(df)
    val jsonLines = serialized.select(to_json(
      struct(serialized.columns.map(col).toIndexedSeq: _*),
      java.util.Map.of("ignoreNullFields", "false")))
    var n = 0L
    // singer_sdk stamps each RECORD with time_extracted (ISO8601 UTC);
    // one timestamp per sync — resolved by the caller so tests stay
    // deterministic and all of a stream's records agree
    val te = timeExtracted
      .map(t => s""","time_extracted":"$t"""").getOrElse("")
    val prefix = s"""{"type":"RECORD","stream":"${stream.name}","record":"""
    val it = jsonLines.toLocalIterator()
    while (it.hasNext) {
      out.println(prefix + it.next().getString(0) + te + "}")
      n += 1
    }
    n
  }

  def emitState(state: TapState, out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val bms = state.bookmarks.toSeq.sortBy(_._1).map { case (sid, v) =>
      s"${q(sid)}:{${q("replication_key_value")}:${q(v)}}"
    }.mkString("{", ",", "}")
    out.println(s"""{"type":"STATE","value":{"bookmarks":$bms}}""")
  }
}
