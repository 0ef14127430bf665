package graft

import graft.functions.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalRank equals the window rank on random data with heavy ties") {
    val rnd = new Random(11)
    val rows = (1L to 1000L).map(i => (i, rnd.nextInt(50).toLong - 25L))
    val df = rows.toDF("id", "v")
    val expected = df
      .withColumn("r", row_number().over(
        Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = Analytics.globalRank(df, "v", "id", nRangeBuckets = 16)
      .select(col("id"), col("__rank")).as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("globalRank handles a constant column (single bucket)") {
    val df = (1L to 20L).map(i => (i, 7L)).toDF("id", "v")
    val got = Analytics.globalRank(df, "v", "id")
      .select(col("id"), col("__rank")).as[(Long, Long)].collect().toMap
    assert(got === (1L to 20L).map(i => i -> i).toMap)
  }

  test("ntileFromRank matches the SQL window ntile for awkward n/k splits") {
    for (n <- Seq(1, 3, 5, 7, 11, 50); k <- Seq(2, 5, 7)) {
      val df = (1L to n.toLong).toDF("r").withColumn("n", lit(n.toLong))
      val viaWindow = df
        .withColumn("t", ntile(k).over(Window.orderBy("r")))
        .select("r", "t").as[(Long, Int)].collect().toMap
      val viaRank = df
        .withColumn("t", Analytics.ntileFromRank("r", "n", k))
        .select("r", "t").as[(Long, Int)].collect().toMap
      assert(viaRank === viaWindow, s"n=$n k=$k")
    }
  }

  test("topPaths: triples counted per user in time order, deterministic top-k") {
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      (1L, 1L, "a", t("10:00:00")), (1L, 2L, "b", t("10:01:00")),
      (1L, 3L, "c", t("10:02:00")), (1L, 4L, "a", t("10:03:00")),
      (2L, 5L, "a", t("09:00:00")), (2L, 6L, "b", t("09:01:00")),
      (2L, 7L, "c", t("09:02:00")),
      (3L, 8L, "x", t("08:00:00")), (3L, 9L, "y", t("08:01:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.topPaths(ev, "user_id", "ts", "event_type",
        "event_id", k = 5)
      .as[(String, String, String, Long)].collect().toSeq
    // (a,b,c) ×2 (users 1 and 2), (b,c,a) ×1 (user 1); user 3 too short
    assert(got === Seq(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
  }

  test("rfmSegments: quintiles on a hand-checkable fixture") {
    // 5 users, one event each on distinct days, distinct values:
    // user i last active day 2024-01-0(i), spent i dollars, 1 event.
    val ts = (1 to 5).map(i => java.sql.Timestamp.valueOf(f"2024-01-0$i%d 10:00:00"))
    val ev = (1 to 5).map(i => (i.toLong, ts(i - 1), i.toDouble)).toDF("u", "ts", "value")
    val got = Analytics.rfmSegments(ev, "u", "ts", "value")
      .select("u", "rec_days", "frequency", "monetary_cents",
        "r_bucket", "f_bucket", "m_bucket")
      .as[(Long, Int, Long, Long, Int, Int, Int)].collect().sortBy(_._1)
    // user 5 most recent (rec_days 0 → r=1), user 1 oldest (r=5);
    // all frequencies tie at 1 → f buckets by user_id asc; monetary
    // desc → user 5 first (m=1)
    assert(got.map(r => (r._1, r._2, r._5, r._6, r._7)).toSeq === Seq(
      (1L, 4, 5, 1, 5), (2L, 3, 4, 2, 4), (3L, 2, 3, 3, 3),
      (4L, 1, 2, 4, 2), (5L, 0, 1, 5, 1)))
    assert(got.map(_._4).toSeq === Seq(100L, 200L, 300L, 400L, 500L))
  }
}
