package graft

import graft.plans.SignatureExpressions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-path registration of the native expressions: plain SQL can call
  * graft_minhash / graft_simhash after registration, and outputs agree
  * with the Column API and the builtin-HOF formulations.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("registered SQL functions match the Column API and HOF forms") {
    SignatureExpressions.register(spark)
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("sqlfn_t")

    val sqlSig = spark.sql(
      "SELECT graft_minhash(array(text)) AS sig, graft_simhash(split(text, ' ')) AS sh FROM sqlfn_t")
      .collect()(0)
    val apiRow = spark.table("sqlfn_t").select(
      graft.functions.Dedup.minhashSignature(array(col("text"))).as("sig"),
      graft.functions.Dedup.simhash(col("text")).as("sh")).collect()(0)
    val hofRow = spark.table("sqlfn_t").select(
      graft.functions.Dedup.minhashSignatureHof(array(col("text"))).as("sig"),
      graft.functions.Dedup.simhashHof(col("text")).as("sh")).collect()(0)

    assert(sqlSig.getSeq[Long](0) === apiRow.getSeq[Long](0))
    assert(apiRow.getSeq[Long](0) === hofRow.getSeq[Long](0))
    assert(sqlSig.getLong(1) === apiRow.getLong(1))
    assert(apiRow.getLong(1) === hofRow.getLong(1))
  }
}
