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
    */
  def emitRecords(df: DataFrame, stream: StreamConfig,
                  out: PrintStream = System.out,
                  timeExtracted: Option[String] = None): (Long, Option[String]) = {
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
    }
    (n, Option(bestStr))
  }

  def emitState(state: TapState, out: PrintStream = System.out): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val bms = state.bookmarks.toSeq.sortBy(_._1).map { case (sid, v) =>
      s"${q(sid)}:{${q("replication_key_value")}:${q(v)}}"
    }.mkString("{", ",", "}")
    out.println(s"""{"type":"STATE","value":{"bookmarks":$bms}}""")
  }
}
