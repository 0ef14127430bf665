package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(1f, 1f, 0f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
    assert(math.abs(sims(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("zero vector cosine is 0, not NaN") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).as[Double].head() === 0.0)
  }

  // The native tight-loop dot must be bit-identical to the HOF left-fold
  // over the fixture embeddings (same IEEE operation sequence).
  test("native dot equals HOF dot bit-for-bit on fixture embeddings") {
    val emb = SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    val a = emb.select(org.apache.spark.sql.functions.col("vec_id").as("ia"),
      org.apache.spark.sql.functions.col("embedding").as("va"))
    val b = emb.select(org.apache.spark.sql.functions.col("vec_id").as("ib"),
      org.apache.spark.sql.functions.col("embedding").as("vb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(5000)
    val diff = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("native"),
      Similarity.dotHof(col("va"), col("vb")).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(diff === 0)
  }

  test("brute-force top-k ranks by similarity") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f))
    ).toDF("id", "v")
    val queries = Seq((10L, Seq(1f, 0f))).toDF("id", "v")
    val top = Similarity.bruteForceTopK(corpus, queries, "id", "v", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L))
  }

  test("ANN top-k achieves reasonable recall vs brute force on fixture embeddings") {
    // NOTE: the fixture embeddings are uniform-random (no cluster
    // structure) — the adversarial case for LSH, since true neighbors sit
    // barely above the bulk. 4 bits / distance-1 probes scans ~1/3 of the
    // corpus; on clustered real embeddings the same setup gives far higher
    // recall at far lower scan fractions.
    val emb = Tables.read(spark, SparkTestSession.Sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annTopK(emb, queries, "vec_id", "embedding",
        k = 10, nBits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall too low")
  }

  test("cosineDupPairs finds planted near-duplicates") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.99f, 0.01f, 0f)), (3L, Seq(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineDupPairs(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("bucketed dup pairs find planted near-duplicates (dim-matched planes)") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.99f, 0.01f, 0f)), (3L, Seq(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineDupPairsBucketed(df, "vec_id", "embedding",
        threshold = 0.95, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  // Precision must be EXACT (every emitted pair also found by the
  // quadratic reference at the same threshold); recall is the banded
  // S-curve — ~75% at the threshold boundary for the auto-derived
  // (bands, bitsPerBand), asserted with slack against the fixture's
  // uniform-random (LSH-adversarial) embeddings.
  test("bucketed dup pairs: exact precision, bounded recall vs quadratic reference") {
    val emb = Tables.read(spark, SparkTestSession.Sf, "embeddings")
    val exact = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.cosineDupPairsBucketed(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain pairs above threshold")
    assert((bucketed diff exact).isEmpty,
      s"bucketed emitted pairs the exact form rejects: ${bucketed diff exact}")
    val recall = (bucketed intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below S-curve expectation")
  }

  // The Long-id fast path verifies pairs inside each bucket with a local
  // double fold + HALF_UP rounding; the generic-id fallback goes through
  // the DotF/round() join pipeline. Same bucketing, same rounding contract
  // — the two paths must agree BIT-FOR-BIT on every emitted (pair, value).
  test("bucket-local verify is bit-equal to the join-based fallback path") {
    val emb = Tables.read(spark, SparkTestSession.Sf, "embeddings")
    val fast = Similarity.cosineDupPairsBucketed(emb, "vec_id", "embedding", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    // string ids route to the window-cap + join-verify fallback; its
    // a<b orientation is lexicographic, so canonicalize to (min, max)
    val slow = Similarity.cosineDupPairsBucketed(
        emb.withColumn("vec_id", col("vec_id").cast("string")),
        "vec_id", "embedding", 0.4)
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("cos_sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (math.min(a, b), math.max(a, b), c) }.toSet
    assert(fast === slow)
  }

  test("signLshParams tracks the collision probability of the threshold") {
    // cos 0.9 → p ≈ 0.856: the chosen split's midpoint must sit closer to
    // p than either neighboring divisor split of 32 bits.
    val (b, r) = Similarity.signLshParams(32, 0.9)
    assert(b * r === 32)
    val p = 1.0 - math.acos(0.9) / math.Pi
    val err = math.abs(math.pow(1.0 / b, 1.0 / r) - p)
    for (alt <- Seq((2, 16), (4, 8), (8, 4), (16, 2), (32, 1)) if alt != ((b, r))) {
      val altErr = math.abs(math.pow(1.0 / alt._1, 1.0 / alt._2) - p)
      assert(err <= altErr, s"($b,$r) err $err worse than $alt err $altErr")
    }
  }
}
