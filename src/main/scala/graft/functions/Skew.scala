package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns.
  *
  * Spark's AQE handles skewed *joins* (`skewJoin` splits oversized
  * partitions), but a groupBy whose key distribution is pathological
  * (one key = 30% of 100 TB) still funnels one reducer. Salting splits
  * each key into `buckets` sub-keys for a first partial aggregate, then
  * re-aggregates the (tiny) salted results — turning one hot reducer into
  * `buckets` parallel ones. Only algebraic aggregates (sum/count/min/max)
  * compose this way; the API takes them explicitly.
  */
object Skew {

  /** Two-phase salted aggregation:
    * `df.groupBy(keys).agg(sum(x))` ≡ `saltedAgg(df, keys, buckets, "x" -> "sum")`.
    *
    * @param aggs (inputCol, func) pairs with func ∈ sum|count|min|max;
    *             output column is named `func_inputCol`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                aggs: Seq[(String, String)]): DataFrame = {
    require(aggs.forall(a => Set("sum", "count", "min", "max")(a._2)),
      "saltedAgg supports algebraic aggregates only (sum/count/min/max)")
    def phase1(c: String, f: String): Column = f match {
      case "sum" => sum(col(c)).as(s"${f}_$c")
      case "count" => count(col(c)).as(s"${f}_$c")
      case "min" => min(col(c)).as(s"${f}_$c")
      case "max" => max(col(c)).as(s"${f}_$c")
    }
    // re-aggregation of partials: count partials are SUMMED
    def phase2(c: String, f: String): Column = f match {
      case "sum" | "count" => sum(col(s"${f}_$c")).as(s"${f}_$c")
      case "min" => min(col(s"${f}_$c")).as(s"${f}_$c")
      case "max" => max(col(s"${f}_$c")).as(s"${f}_$c")
    }
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1(aggs.head._1, aggs.head._2),
        aggs.tail.map(a => phase1(a._1, a._2)): _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2(aggs.head._1, aggs.head._2),
        aggs.tail.map(a => phase2(a._1, a._2)): _*)
  }

  /** Salted equi-join for a skewed FACT side against a dimension too big
    * (or forbidden) to broadcast: the dimension replicates `buckets`×
    * (explode over the salt range), each fact row picks ONE deterministic
    * salt, and the join runs on `keys :+ salt` — so a hot key's rows
    * spread over `buckets` reducers instead of funneling one sort-merge
    * partition. Result set is EXACTLY the plain join's (each fact row
    * still meets each matching dim row exactly once — on its own salt
    * replica); cost is `buckets`× the dim shuffle, the standard trade.
    *
    * `salt` must be a deterministic per-row expression on the fact side
    * (a hash of stable columns), NOT rand(): retries and speculative
    * tasks must re-derive the same salt or rows silently drop/duplicate
    * under the join. AQE's OptimizeSkewedJoin handles the
    * detectable-at-runtime cases; explicit salting remains the tool when
    * skew is known ahead (power-law keys at 100 TB) or the join sits
    * inside a cached/bucketed plan AQE won't re-split.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, salt: Column): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val dimR = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val factS = fact.withColumn("__salt",
      pmod(salt, lit(buckets)).cast("int"))
    factS.join(dimR, keys :+ "__salt").drop("__salt")
  }
}
