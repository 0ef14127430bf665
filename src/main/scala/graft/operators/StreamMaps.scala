package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config-driven per-stream transforms: alias/drop/compute columns and
  * filter rows — the `STREAM_MAPS` capability surface
  * (reference: tap_rawpostgresql/tap.py:256; config keys `stream_maps`,
  * `stream_map_config` per README.md:35-36).
  *
  * Where the SDK evaluates Python `simpleeval` expressions per record, this
  * engine evaluates Spark SQL expressions (`expr`) — codegen'd, columnar,
  * and optimizable by Catalyst (a computed column or filter participates in
  * pushdown/pruning like any other expression).
  *
  * @param computed new/overwritten columns: name → Spark SQL expression
  * @param aliases  renames: old name → new name
  * @param dropped  columns to remove
  * @param filter   row predicate (Spark SQL boolean expression)
  * @param alias    emitted stream name override (SDK `__alias__`)
  * @param elseDrop SDK `"__else__": null` — keep ONLY the explicitly
  *                 mapped columns (plus whatever the caller must retain:
  *                 key properties, replication key)
  */
final case class StreamMap(
    computed: Seq[(String, String)] = Nil,
    aliases: Seq[(String, String)] = Nil,
    dropped: Seq[String] = Nil,
    filter: Option[String] = None,
    alias: Option[String] = None,
    elseDrop: Boolean = false)

object StreamMaps {
  def apply(df: DataFrame, m: StreamMap, alwaysKeep: Seq[String] = Nil): DataFrame = {
    // filter first: the SDK evaluates __filter__ against the source
    // record, so the predicate may reference columns later dropped/renamed
    var out = df
    m.filter.foreach(f => out = out.filter(expr(f)))
    m.computed.foreach { case (name, e) => out = out.withColumn(name, expr(e)) }
    m.aliases.foreach { case (from, to) => out = out.withColumnRenamed(from, to) }
    if (m.dropped.nonEmpty) out = out.drop(m.dropped: _*)
    if (m.elseDrop) {
      val keep = (m.computed.map(_._1) ++ m.aliases.map(_._2) ++ alwaysKeep)
        .distinct.filter(out.columns.contains)
      out = out.select(keep.map(col): _*)
    }
    out
  }
}
