package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed by custom Catalyst
  * expressions: Column ⇄ Expression conversion (Spark 4 Columns wrap
  * ColumnNodes, not Expressions) and temp-function registration. Standard
  * extension-library technique — the only code in this repo living outside
  * the graft package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerTempFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
