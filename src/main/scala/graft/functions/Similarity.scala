package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - **brute-force top-k**: broadcast the (small) query set, compute exact
  *    cosine against every corpus row, keep top-k per query with a
  *    per-query window. Exact; cost = |corpus| × |queries| dot products,
  *    fully parallel, zero shuffle until the final (tiny) top-k.
  *  - **LSH-bucketed ANN**: sign-random-projection signatures
  *    (Charikar, STOC'02) bucket the corpus; a query only scans its bucket
  *    (plus multi-probe neighbors). This is the 100 TB path: the corpus is
  *    hash-partitioned by bucket once, and each query touches
  *    |corpus| / 2^bits rows instead of all of them.
  *
  * All dot products fold left-to-right in double precision
  * (`aggregate(zip_with(...)))`), which keeps results deterministic and
  * oracle-comparable.
  */
object Similarity {

  /** Dot product of two numeric-array columns, computed in double.
    * Native tight-loop expression ([[graft.plans.DotF]]) with the same
    * left-to-right IEEE fold as the builtin-HOF form
    * `aggregate(zip_with(a, b, (x,y) => xd*yd), 0.0, _+_)` — identical
    * values (SimilaritySpec), ~10× cheaper per pair.
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.SignatureExpressions.dotF(a, b)

  /** Builtin-HOF formulation of [[dot]] (kept for the equality spec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns 0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact top-k neighbors per query vector via broadcast + window.
    * Ties break on neighbor id for determinism.
    *
    * @param corpus  (idCol, vecCol) rows — the big side, never shuffled
    *                until the per-query top-k (which carries only
    *                (queryId, id, sim)).
    * @param queries (idCol, vecCol) rows — must be broadcast-small.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    // norms are precomputed once per side, not per pair: sqrt(dot(v,v)) is
    // the same IEEE value wherever it is computed, so cosine results are
    // unchanged while the per-pair cost drops to one dot + one multiply
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val joined = c.crossJoin(broadcast(q))
    val scored = joined
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("qv"), col("cv"), col("qn") * col("cn")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Cosine with a precomputed denominator (`norm(a)*norm(b)`). */
  def cosinePrenormed(a: Column, b: Column, denom: Column): Column =
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)

  /** Deterministic random hyperplanes for sign-projection LSH. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** LSH bucket id: one sign bit per hyperplane, packed into a Long.
    * Pure projection — the corpus signature is computed once and can be
    * persisted/partitioned by bucket.
    */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (hp, i) =>
      val hpLit = array(hp.map(lit(_)): _*)
      when(dot(vecCol, hpLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe neighbor buckets: the bucket itself plus every bucket at
    * Hamming distance 1 (flip each bit). Probing 1+nBits buckets bounds
    * the recall loss of a single-bucket scan.
    */
  def probeBuckets(bucket: Column, nBits: Int): Column =
    array((bucket +: (0 until nBits).map(i => bucket.bitwiseXOR(lit(1L << i)))): _*)

  /** Approximate top-k: bucket the corpus by LSH signature, explode each
    * query into its probe buckets, join on bucket (the corpus side is
    * hash-partitioned by bucket — at scale this is a co-located join
    * against a bucketed table), then exact-cosine + top-k within the
    * candidate set.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nBits: Int = 12, dim: Int = 64, seed: Long = 42L,
              excludeSelf: Boolean = true): DataFrame = {
    val planes = hyperplanes(nBits, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      explode(probeBuckets(lshBucket(col(vecCol), planes), nBits)).as("bucket"))
    val candidates = c.join(broadcast(q), "bucket")
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("qv"), col("cv"), col("qn") * col("cn")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b) with cosine ≥
    * threshold. Exact quadratic form for oracle-checkable scales; at 100 TB
    * use [[annTopK]]-style bucketing first and verify within buckets —
    * same verify expression, linearized candidate generation.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosinePrenormed(col("va"), col("vb"), col("na") * col("nb")), 6)
          .as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
