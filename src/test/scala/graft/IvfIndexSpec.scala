package graft

import graft.functions.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("IVF search beats its scan fraction on recall and is exact at full probe") {
    val emb = Tables.read(spark, SparkTestSession.Sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val index = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8)
    assert(index.centroids.length === 8)

    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    // full probe (all lists) must reproduce the exact result
    val full = IvfIndex.search(index, queries, "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === exact)

    // probing half the lists: uniform-random embeddings are the LSH/IVF
    // adversarial case, but recall should comfortably beat the ~4/8 scan
    // fraction baseline
    val half = IvfIndex.search(index, queries, "vec_id", "embedding",
        k = 10, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect half).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }
}
