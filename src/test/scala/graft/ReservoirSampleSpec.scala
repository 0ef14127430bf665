package graft

import graft.plans.ReservoirSample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReservoirSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bottom-k reservoir is deterministic and partitioning-independent") {
    val df = spark.range(0, 5000).select(concat(lit("v"), col("id")).as("s"))
    val a = df.agg(ReservoirSample.reservoir(col("s"), 20).as("sample"))
      .collect()(0).getSeq[String](0)
    val b = df.repartition(17).agg(ReservoirSample.reservoir(col("s"), 20).as("sample"))
      .collect()(0).getSeq[String](0)
    assert(a.length === 20)
    assert(a === b) // merge-order independence
  }

  test("smaller k is a prefix of larger k (bottom-k nesting)") {
    val df = spark.range(0, 1000).select(concat(lit("x"), col("id")).as("s"))
    val k10 = df.agg(ReservoirSample.reservoir(col("s"), 10).as("r"))
      .collect()(0).getSeq[String](0)
    val k50 = df.agg(ReservoirSample.reservoir(col("s"), 50).as("r"))
      .collect()(0).getSeq[String](0)
    assert(k50.take(10) === k10)
  }

  test("per-group reservoirs with nulls ignored") {
    val df = Seq(("a", "x1"), ("a", "x2"), ("a", null), ("b", "y1"))
      .toDF("g", "s")
    val out = df.groupBy("g")
      .agg(ReservoirSample.reservoir(col("s"), 5).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("a").toSet === Set("x1", "x2"))
    assert(out("b") === Seq("y1"))
  }
}
