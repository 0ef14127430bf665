package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Session registration for the dialect layer's native helper functions
  * (the ones SqlDialect-rewritten SQL references by name). Idempotent —
  * StreamSource calls it before every spark.sql of rewritten text.
  */
object PgFunctions {

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("pg_to_char_num")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("pg_to_char_num", {
        (exprs: Seq[Expression]) => exprs match {
          case Seq(e, Literal(t: UTF8String, StringType)) =>
            graft.plans.PgToCharNum(e, t.toString)
          case _ => throw new IllegalArgumentException(
            "pg_to_char_num(expr, 'template'): template must be a " +
              "string literal")
        }
      }, "built-in")
    }
  }
}
