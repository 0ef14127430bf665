package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Nested-schema flattening: expand struct fields to `parent__child`
  * columns, depth-limited — the `FLATTENING` capability
  * (reference: tap_rawpostgresql/tap.py:257; `__`-joined names up to
  * `flattening_max_depth` per README.md:37-38).
  *
  * Pure `select` over struct field accessors: a single Catalyst `Project`,
  * so it stays inside whole-stage codegen and costs no shuffle.
  */
object Flattener {

  val Separator = "__"

  def flatten(df: DataFrame, maxDepth: Int = Int.MaxValue): DataFrame =
    df.select(flattenFields(df.schema, prefix = Nil, depth = maxDepth): _*)

  private def flattenFields(schema: StructType, prefix: Seq[String],
                            depth: Int): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val path = prefix :+ f.name
      f.dataType match {
        case s: StructType if depth > 0 =>
          flattenFields(s, path, depth - 1)
        case _ =>
          // quote each path segment so dotted/odd names survive
          val accessor = col(path.map(p => s"`$p`").mkString("."))
          Seq(accessor.as(path.mkString(Separator)))
      }
    }
}
