package graft

import graft.functions.EntityResolution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def recs = Seq(
    (1L, "robert smith", 10.0),
    (2L, "robert smith", 5.0),   // exact dup of 1
    (3L, "robert smyth", 1.0),   // edit 1 from both
    (4L, "bob jones", 7.0),      // same block ("bob"), far from all
    (5L, "zelda brown", 3.0),    // different block, isolated
    (6L, "zelda brown", 3.0)     // tie on rank with 5 → lower id wins
  ).toDF("id", "name", "rank")

  test("blockedPairs: verified pairs inside blocks only, distances exact") {
    val got = EntityResolution.blockedPairs(recs, "id", "name",
        substring(col("name"), 1, 3), maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1), (5L, 6L, 0)))
    // "bob jones" shares block "bob"? no — block is "rob" vs "bob";
    // even same-block far names (4 is alone in "bob") emit nothing
  }

  test("blockedPairs: a cross-block near-identical pair is NOT compared") {
    val df = Seq((1L, "anna"), (2L, "bnna")).toDF("id", "name")
    val got = EntityResolution.blockedPairs(df, "id", "name",
      substring(col("name"), 1, 1), maxEdits = 2)
    assert(got.count() === 0L) // blocks "a" vs "b": blocking recall trade
  }

  test("blockedPairs: maxBlock drops an over-common block whole") {
    val df = (1L to 10L).map(i => (i, "same name")).toDF("id", "name")
      .union(Seq((20L, "rare x"), (21L, "rare y")).toDF("id", "name"))
    val capped = EntityResolution.blockedPairs(df, "id", "name",
      substring(col("name"), 1, 4), maxEdits = 2, maxBlock = 5L)
    // the 10-member "same" block squares to 45 pairs uncapped; capped
    // keeps only the 2-member "rare" block's single pair
    assert(capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((20L, 21L)))
    val uncapped = EntityResolution.blockedPairs(df, "id", "name",
      substring(col("name"), 1, 4), maxEdits = 2)
    assert(uncapped.count() === 46L)
  }

  test("batch pairs tile the full pair set; incremental resolve equals from-scratch") {
    val corpus = Seq(
      (1L, "robert smith", 10.0), (2L, "robert smith", 5.0),
      (4L, "bob jones", 7.0), (5L, "zelda brown", 3.0)
    ).toDF("id", "name", "rank")
    val batch = Seq(
      (3L, "robert smyth", 1.0),   // links 1-2's entity
      (6L, "zelda brown", 3.0),    // links 5's
      (7L, "bob jonez", 2.0),      // links 4's (edit 1)
      (8L, "quinn ray", 9.0)       // brand-new singleton
    ).toDF("id", "name", "rank")
    val blk = substring(col("name"), 1, 3)

    val full = EntityResolution.blockedPairs(corpus.unionByName(batch),
        "id", "name", blk, maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSet
    val tiled = EntityResolution.blockedPairs(corpus, "id", "name", blk,
        maxEdits = 2).as[(Long, Long, Int)].collect().toSet ++
      EntityResolution.blockedPairsAgainst(corpus, batch, "id", "name",
        blk, maxEdits = 2).as[(Long, Long, Int)].collect().toSet
    assert(tiled === full)

    val cols = Seq("id", "entity_id", "canonical_id", "canonical_name",
      "n_members")
    val fromScratch = EntityResolution.resolve(corpus.unionByName(batch),
        "id", "name", blk, maxEdits = 2, rankCol = "rank")
      .select(cols.map(col): _*)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    val incremental = EntityResolution.resolveIncremental(corpus, batch,
        "id", "name", blk, maxEdits = 2, rankCol = "rank")
      .select(cols.map(col): _*)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(incremental === fromScratch)
    // sanity on content: the new singleton stands alone
    assert(incremental.exists(r => r._1 == 8L && r._5 == 1L))
  }

  test("resolve: min-id entities, max-rank survivor with lower-id ties, singletons") {
    val got = EntityResolution.resolve(recs, "id", "name",
        substring(col("name"), 1, 3), maxEdits = 2, rankCol = "rank")
      .select("id", "entity_id", "canonical_id", "canonical_name", "n_members")
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1L, "robert smith", 3L),
      (2L, 1L, 1L, "robert smith", 3L),
      (3L, 1L, 1L, "robert smith", 3L),  // survivor = highest rank (id 1)
      (4L, 4L, 4L, "bob jones", 1L),     // unmatched: own entity
      (5L, 5L, 5L, "zelda brown", 2L),   // rank tie 5 vs 6 → lower id
      (6L, 5L, 5L, "zelda brown", 2L)))
  }
}
