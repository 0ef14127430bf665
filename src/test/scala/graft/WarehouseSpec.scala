package graft

import graft.functions.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("mergeCdc applies updates, deletes, inserts; untouched rows survive") {
    val changes = Seq(
      (2L, 1L, "U", "b2", 22.0), // update
      (3L, 1L, "D", null, 0.0),  // delete
      (9L, 1L, "U", "i", 99.0)   // insert (no snapshot match)
    ).toDF("k", "seq", "op", "s", "v")
    val got = Warehouse.mergeCdc(snap, changes, "k", "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0), (9L, "i", 99.0)))
  }

  test("mergeCdc elects the latest change per key by seq") {
    val changes = Seq(
      (2L, 1L, "U", "first", 1.0),
      (2L, 3L, "U", "last", 3.0),
      (2L, 2L, "U", "middle", 2.0),
      (3L, 1L, "U", "resurrect", 5.0),
      (3L, 2L, "D", null, 0.0) // later delete wins over earlier update
    ).toDF("k", "seq", "op", "s", "v")
    val got = Warehouse.mergeCdc(snap, changes, "k", "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "last", 3.0), (4L, "d", 40.0)))
  }

  test("mergeCdc with an empty change batch is the identity") {
    val changes = Seq.empty[(Long, Long, String, String, Double)]
      .toDF("k", "seq", "op", "s", "v")
    val got = Warehouse.mergeCdc(snap, changes, "k", "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === snap.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("mergeAggState over a random split equals the full recompute") {
    val rnd = new Random(7)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(20)}", rnd.nextInt(100).toLong,
        BigDecimal(rnd.nextInt(100000)) / 100)
    }
    val df = rows.toDF("g", "n", "x")
      .select(col("g"), col("n"), col("x").cast("decimal(18,6)").as("x"))
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    val full = agg(df).select(col("g"), col("n"), col("x").cast("string"))
      .as[(String, Long, String)].collect().sortBy(_._1)
    // split on an arbitrary predicate; merged partial aggregates must
    // reproduce the full aggregate exactly (counts + decimal sums)
    val merged = Warehouse.mergeAggState(
        agg(df.where(col("n") < 37)), agg(df.where(col("n") >= 37)),
        Seq("g"), Seq("n", "x"))
      .select(col("g"), col("n"), col("x").cast("string"))
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq === full.toSeq)
  }
}
