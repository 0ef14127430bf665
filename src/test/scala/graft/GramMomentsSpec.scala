package graft

import graft.plans.GramMoments
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GramMomentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gramMoments: hand-computed moments on a dim-2 table") {
    // vectors (1,2), (3,4), (5,6):
    //   n=3, Σx=9, Σy=12, Σxx=35, Σxy=44, Σyy=56
    val df = Seq(Array(1L, 2L), Array(3L, 4L), Array(5L, 6L)).toDF("qv")
    val got = df.agg(GramMoments.gramMoments(col("qv"), 2).as("m"))
      .select(explode(col("m")).as("e"))
      .select("e.i", "e.j", "e.sum_i", "e.sum_j", "e.sum_ij", "e.n")
      .as[(Int, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((0, 0)) === ((0, 0, 9L, 9L, 35L, 3L)))
    assert(got((0, 1)) === ((0, 1, 9L, 12L, 44L, 3L)))
    assert(got((1, 1)) === ((1, 1, 12L, 12L, 56L, 3L)))
    assert(got.size === 3)
  }

  test("gramMoments: null vectors are skipped, not counted in n") {
    val df = Seq(Some(Array(2L, 0L)), None, Some(Array(0L, 3L)))
      .toDF("qv")
    val got = df.agg(GramMoments.gramMoments(col("qv"), 2).as("m"))
      .select(explode(col("m")).as("e"))
      .select("e.i", "e.j", "e.sum_ij", "e.n")
      .as[(Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((0, 0))._4 === 2L)
    assert(got((0, 1))._3 === 0L) // the two vectors never overlap
  }

  test("gramMoments is bit-equal to the explode formulation on fixture embeddings") {
    val q = Tables.read(spark, SparkTestSession.Sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1048576.0).cast("long")).as("qv"))
    val native = q
      .agg(GramMoments.gramMoments(col("qv"), 64).as("m"))
      .select(explode(col("m")).as("e"))
      .select("e.i", "e.j", "e.sum_i", "e.sum_j", "e.sum_ij", "e.n")
      .as[(Int, Int, Long, Long, Long, Long)].collect().toSet
    val exploded = {
      val x = q.select(col("vec_id"),
        posexplode(col("qv")).as(Seq("i", "v")))
      x.as("a").join(x.as("b"),
          col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(col("a.v")).as("sum_i"), sum(col("b.v")).as("sum_j"),
          sum(col("a.v") * col("b.v")).as("sum_ij"),
          count(lit(1)).as("n"))
        .as[(Int, Int, Long, Long, Long, Long)].collect().toSet
    }
    assert(native === exploded)
    assert(native.size === 64 * 65 / 2)
  }

  test("gramMoments: merge-tree invariance — 1 vs 32 partitions agree exactly") {
    val q = Tables.read(spark, SparkTestSession.Sf, "embeddings")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 1048576.0).cast("long")).as("qv"))
    def run(parts: Int) = q.repartition(parts)
      .agg(GramMoments.gramMoments(col("qv"), 64).as("m"))
      .select(explode(col("m")).as("e"))
      .select("e.i", "e.j", "e.sum_ij", "e.n")
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(run(1) === run(32))
  }

  test("gramMoments is registered for SQL as graft_gram_moments") {
    graft.plans.SignatureExpressions.register(spark)
    Seq(Array(1L, 1L), Array(2L, 2L)).toDF("qv")
      .createOrReplaceTempView("gm_in")
    val m = spark.sql("SELECT graft_gram_moments(qv, 2) AS m FROM gm_in")
      .select(explode(col("m")).as("e"))
      .select("e.i", "e.j", "e.sum_ij", "e.n")
      .as[(Int, Int, Long, Long)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(m((0, 1)) === ((0, 1, 5L, 2L)))
  }
}
