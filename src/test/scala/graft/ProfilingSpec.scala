package graft

import graft.functions.Profiling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("keySkew: top-k by count desc with key-asc tie-break, integer factor") {
    // key 1 ×4, key 2 ×2, keys 3 and 4 ×1 (tie broken by key order)
    val df = Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 4L).toDF("k")
    val got = Profiling.keySkew(df, "k", topK = 3)
      .select("k", "n_rows_key", "n_rows_total", "n_keys_total",
        "max_rows_key", "skew_x1000")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 8 rows, 4 keys, max 4 → skew = 4*1000*4/8 = 2000
    assert(got === Seq(
      (1L, 4L, 8L, 4L, 4L, 2000L),
      (2L, 2L, 8L, 4L, 4L, 2000L),
      (3L, 1L, 8L, 4L, 4L, 2000L)))
  }

  test("keySkew on a uniform key distribution reports skew_x1000 = 1000") {
    val df = (0L until 100L).map(i => i % 10).toDF("k")
    val got = Profiling.keySkew(df, "k", topK = 1)
      .select("skew_x1000").as[Long].collect()
    assert(got.toSeq === Seq(1000L))
  }

  test("histogram: division-free buckets cover every row, max lands in last") {
    val df = (0L to 99L).toDF("cents")
    val got = Profiling.histogram(df, "cents", nBuckets = 10)
      .select("bucket", "n", "lo_cents", "hi_cents")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 10)
    assert(got.map(_._2).sum === 100L)
    // width = (99-0+1)/10 = 10 exactly: bucket i holds [10i, 10i+9]
    got.foreach { case (b, n, lo, hi) =>
      assert(n === 10L); assert(lo === 10L * b); assert(hi === 10L * b + 9)
    }
  }

  test("histogram: single-value column collapses to bucket 0") {
    val df = Seq.fill(5)(42L).toDF("cents")
    val got = Profiling.histogram(df, "cents", nBuckets = 8)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((0, 5L, 42L, 42L)))
  }

  test("data-quality checks count planted violations exactly") {
    import org.apache.spark.sql.DataFrame
    val t: DataFrame = Seq(
      (1L, Option(10L), "O"), (2L, Option(20L), "F"),
      (2L, Option(20L), "F"),            // duplicate key (1 extra row)
      (3L, None, "O"),                   // null FK
      (4L, Option(99L), "X"),            // orphan FK + bad status
      (5L, Option(10L), "P")
    ).toDF("k", "fk", "status")
    val parent = Seq(10L, 20L).toDF("pk")
    def one(df: DataFrame): (String, Long, Long) = {
      val r = df.collect().head
      (r.getString(0), r.getLong(2), r.getLong(3))
    }
    assert(one(Profiling.checkNotNull(t, "t", "fk")) === (("not_null:fk", 1L, 6L)))
    assert(one(Profiling.checkUnique(t, "t", "k")) === (("unique:k", 1L, 6L)))
    assert(one(Profiling.checkAcceptedValues(t, "t", "status",
      Seq("O", "F", "P"))) === (("accepted_values:status", 1L, 6L)))
    assert(one(Profiling.checkRefIntegrity(t, "t", "fk", parent, "pk"))
      === (("ref_integrity:fk", 1L, 6L)))
    // keys 1,2,2,3,4,5 against [2,4]: 1 below, 5 above
    assert(one(Profiling.checkRange(t.select(col("k")), "t", "k", 2L, 4L))
      === (("range:k", 2L, 6L)))
  }

  test("histogram: non-divisible range still caps the max into nBuckets-1") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("cents") // range 7, nb 3
    val got = Profiling.histogram(df, "cents", nBuckets = 3)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // bucket = v*3 div 7: 0,0,0 | 1,1 | 2,2
    assert(got.toSeq === Seq((0, 3L, 0L, 2L), (1, 2L, 3L, 4L), (2, 2L, 5L, 6L)))
  }

  test("lDiversity: homogeneous class flagged even when k-anonymous") {
    val df = Seq(
      // class A: 4 rows, all the same sensitive value → at risk at l=2
      ("A", "flu"), ("A", "flu"), ("A", "flu"), ("A", "flu"),
      // class B: 2 rows, 2 distinct values → diverse
      ("B", "flu"), ("B", "cold"),
      // class C: null and non-null are distinct sensitive values
      ("C", null), ("C", "flu")
    ).toDF("quasi", "diagnosis")
    val got = Profiling.lDiversity(df, Seq("quasi"), "diagnosis", l = 2)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 4L, 1L, true)))
    assert(got("B") === (("B", 2L, 2L, false)))
    assert(got("C") === (("C", 2L, 2L, false)))
  }

  test("fdProfile: keys hold, many-to-one violates with counted excess") {
    import graft.functions.Profiling
    val t = Seq(
      (1L, Option(10L), "a"), (2L, Option(10L), "a"), (3L, Option(20L), "b"),
      (4L, Option(20L), "c"), (5L, Option.empty[Long], "d")
    ).toDF("id", "grp", "v")
    // id -> v holds (id is a key; the null-grp row still counts here)
    val k = Profiling.fdProfile(t, Seq("id"), "v", "id->v").head()
    assert(k.getLong(1) === 5L && k.getLong(2) === 5L &&
      k.getLong(3) === 0L && k.getBoolean(4))
    // grp -> v violated: grp 20 maps to {b, c} — one excess association;
    // the null-grp row is excluded (2 distinct grps, 3 pairs)
    val g = Profiling.fdProfile(t, Seq("grp"), "v", "grp->v").head()
    assert(g.getLong(1) === 2L && g.getLong(2) === 3L &&
      g.getLong(3) === 1L && !g.getBoolean(4))
    // composite determinant: (grp, v) -> id violated (grp 10 has two
    // ids under 'a'), but (id, grp) -> v trivially holds
    val c = Profiling.fdProfile(t, Seq("grp", "v"), "id", "(grp,v)->id")
      .head()
    assert(c.getLong(3) === 1L && !c.getBoolean(4))
    assert(Profiling.fdProfile(t, Seq("id", "grp"), "v", "x").head()
      .getBoolean(4))
  }

  test("profile drift: ppm null delta, distinct delta, range flag") {
    import graft.functions.Profiling
    val a = Seq((1L, Option("x")), (2L, Option("y")), (3L, None))
      .toDF("k", "s")
    val b = Seq((1L, Option("x")), (9L, None), (9L, None), (9L, None))
      .toDF("k", "s")
    val got = Profiling.profileDrift(a, b, Seq("k", "s"))
      .collect().map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("null_rate_delta_ppm"),
         r.getAs[Long]("distinct_delta"),
         r.getAs[Boolean]("range_changed"))).toMap
    // k: nulls 0 -> 0; distinct 3 -> 2; max 3 -> 9 (range changed)
    assert(got("k") === ((0L, -1L, true)))
    // s: null rate 1/3 -> 3/4 = +416667 ppm; distinct 2 -> 1; max y -> x
    assert(got("s") === ((750000L - 333333L, -1L, true)))
  }
}
