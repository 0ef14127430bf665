package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hll estimate tracks exact cardinality within the m=64 error band") {
    // 3x the expected 13% standard error, for n in the raw estimator's
    // valid range (n >= 2.5m — below that raw HLL overestimates and a
    // consumer applies linear counting from the emitted zero_buckets;
    // ln is libm-dependent so the engine does not bake it in). A
    // deterministic-hash sketch either passes this forever or never.
    for (n <- Seq(300, 1000, 5000)) {
      val df = (1 to n).map(i => s"user-$i").toDF("u")
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq.empty, col("u")), Seq.empty)
        .select("hll_est").as[Double].head()
      assert(math.abs(est - n) < 0.40 * n,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("hll registers ignore duplicates and layout") {
    val base = (1 to 300).map(i => s"v$i")
    val dups = (base ++ base ++ base.take(50)).toDF("u")
    val once = base.toDF("u").repartition(7)
    val a = Sketches.hllRegisters(dups, Seq.empty, col("u"))
      .as[(Int, Int)].collect().toMap
    val b = Sketches.hllRegisters(once, Seq.empty, col("u"))
      .as[(Int, Int)].collect().toMap
    assert(a === b)
  }

  test("hll registers merge by max across shards") {
    val all = (1 to 400).map(i => s"k$i")
    val (l, r) = all.splitAt(137)
    val merged = Sketches.hllRegisters(l.toDF("u"), Seq.empty, col("u"))
      .unionByName(Sketches.hllRegisters(r.toDF("u"), Seq.empty, col("u")))
      .groupBy("bucket").agg(max("register").as("register"))
      .as[(Int, Int)].collect().toMap
    val full = Sketches.hllRegisters(all.toDF("u"), Seq.empty, col("u"))
      .as[(Int, Int)].collect().toMap
    assert(merged === full)
  }

  test("count-min never underestimates and is exact sans collisions") {
    val items = (Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma")).toDF("term")
    val sketch = Sketches.countMinBuild(items, col("term"))
    val est = Sketches.countMinQuery(
      sketch, Seq("alpha", "beta", "gamma", "absent").toDF("term"), "term")
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 7 && est("beta") >= 3 && est("gamma") >= 1)
    // three distinct terms in a 4x256 grid cannot collide in every row
    assert(est("alpha") === 7 && est("beta") === 3 && est("gamma") === 1)
    assert(est("absent") === 0)
  }

  test("hll p knob: tighter band in range, linear counting below it") {
    val S = Sketches
    // n = 20000 sits inside p=10's valid range (n >= 2.5m = 2560):
    // the raw estimate must land within 3x the ~3.2% standard error
    val big = spark.range(20000).select(lit("g").as("g"), col("id"))
    val est = S.hllEstimate(
        S.hllRegisters(big, Seq("g"), col("id"), p = 10), Seq("g"), p = 10)
      .select("hll_est").as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 3 * 0.0325, s"est=$est")
    // n = 150 is deep in the small-range regime: the raw estimate is
    // biased HIGH, and linear counting m*ln(m/zero_buckets) from the
    // emitted state recovers the truth within ~5%
    val small = spark.range(150).select(lit("g").as("g"), col("id"))
    val row = S.hllEstimate(
        S.hllRegisters(small, Seq("g"), col("id"), p = 10), Seq("g"), p = 10)
      .select("hll_est", "zero_buckets").as[(Double, Long)].head()
    assert(row._1 > 150.0 * 2, s"raw=${row._1}") // documented bias
    val lc = 1024.0 * math.log(1024.0 / row._2.toDouble)
    assert(math.abs(lc - 150.0) / 150.0 < 0.05, s"lc=$lc")
  }

  test("join estimate: provable upper bound, exact side hand-checked") {
    // fa = {a:2, b:1, c:3}, fb = {a:1, c:2, d:5} → exact = 2·1 + 3·2 = 8
    val a = Seq("a", "a", "b", "c", "c", "c").toDF("k")
    val b = Seq("a", "c", "c", "d", "d", "d", "d", "d").toDF("k")
    // sums accumulate in DECIMAL(38,0) (overflow guard) but the emitted
    // scalars are BIGINT — the decimal-typed emission was the only
    // cross-engine hash divergence in the whole gate (r10/r11 driver
    // red); pin the output schema so it cannot silently come back
    val est = Sketches.countMinJoinEstimate(a, col("k"), b, col("k"), "ab")
    assert(est.schema("cm_join_est").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(est.schema("exact_join").dataType ===
      org.apache.spark.sql.types.LongType)
    val row = est
      .select(col("pair"), col("cm_join_est"), col("exact_join"))
      .as[(String, Long, Long)].head()
    assert(row._1 === "ab")
    assert(row._3 === 8L)
    assert(row._2 >= row._3) // CM inner product never underestimates
    // disjoint key sets: exact 0, estimate still a valid (>=0) bound
    val d = Sketches.countMinJoinEstimate(
      Seq("x").toDF("k"), col("k"), Seq("y").toDF("k"), col("k"), "xy")
      .select(col("pair"), col("cm_join_est").cast("long"),
        col("exact_join").cast("long"))
      .as[(String, Long, Long)].head()
    assert(d._3 === 0L && d._2 >= 0L)
  }

  test("count-min sketches merge by cell-wise sum") {
    val docs = Tables.read(spark, SparkTestSession.Sf, "documents")
    val terms = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val half1 = terms.where(crc32(col("term")) % 2 === 0)
    val half2 = terms.where(crc32(col("term")) % 2 === 1)
    val merged = Sketches.countMinBuild(half1, col("term"))
      .unionByName(Sketches.countMinBuild(half2, col("term")))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .as[(Int, Int, Long)].collect().toSet
    val full = Sketches.countMinBuild(terms, col("term"))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged === full)
  }
}
