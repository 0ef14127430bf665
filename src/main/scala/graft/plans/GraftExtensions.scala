package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook: registers the engine's native functions
  * into every session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, making
  * `graft_minhash` / `graft_simhash` available to plain SQL users without
  * any Scala imports.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashSig].getName, "graft_minhash"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          MinHashSig(exprs.head, 64, 42L)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64].getName, "graft_simhash"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHash64(exprs.head)))
  }
}
