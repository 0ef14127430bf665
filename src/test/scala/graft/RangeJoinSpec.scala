package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Boundary semantics on a bare numeric axis: [lo, hi) half-open,
  // multi-bucket intervals, empty intervals dropped, width larger than
  // the span — every (point, interval) match exactly once.
  test("bucketized point-in-interval equals the naive theta join") {
    val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L)
      .toDF("p").withColumn("pid", col("p"))
    val intervals = Seq(
      (1L, 0L, 10L),    // includes 0,5; excludes 10 (half-open)
      (2L, 10L, 100L),  // multi-bucket at width 30; excludes 100
      (3L, 100L, 101L), // single point 100
      (4L, 50L, 50L),   // empty — drops out
      (5L, 240L, 260L)  // width (30) larger than span (20)
    ).toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 7L, 30L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals,
          "lo", "hi", width, axis = c => c)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = points.crossJoin(intervals)
        .where(col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"width=$width")
      // exactly-once: no duplicates even for multi-bucket intervals
      assert(got.distinct === got, s"width=$width produced duplicates")
    }
  }

  // Overlap join: every intersecting pair exactly once via the canonical
  // bucket (first bucket both intervals cover), across widths.
  test("bucketized interval overlap equals the naive theta join") {
    val a = Seq(
      (1L, 0L, 10L), (2L, 5L, 50L), (3L, 100L, 200L), (4L, 7L, 7L)
    ).toDF("aid", "alo", "ahi")
    val b = Seq(
      (10L, 9L, 12L),   // overlaps 1 and 2
      (11L, 49L, 100L), // overlaps 2 only (half-open: 100 !< 100… checks 3)
      (12L, 150L, 160L),// inside 3
      (13L, 10L, 11L),  // touches 1 at hi — half-open, no overlap with 1
      (14L, 300L, 400L) // disjoint
    ).toDF("bid", "blo", "bhi")
    for (width <- Seq(1L, 8L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin.intervalOverlap(
          a, "alo", "ahi", b, "blo", "bhi", width, axis = c => c)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      val want = a.crossJoin(b)
        .where(col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"width=$width")
      assert(got.distinct === got, s"width=$width produced duplicates")
    }
  }

  // Fractional axes: [0.5, 1.2) at width 1 must reach bucket 1 (a point
  // at 1.1 lives there) — the integer-only floor((hi-1)/w) banding missed
  // it. Both join forms, exact vs the naive theta join, across widths.
  test("bucketized joins are exact on a real-valued (fractional) axis") {
    val points = Seq(0.4, 0.5, 1.1, 1.19, 1.2, 2.5, 3.0)
      .toDF("p").withColumn("pid", col("p"))
    val intervals = Seq(
      (1L, 0.5, 1.2),  // the ADVICE case: covers buckets 0 AND 1 at w=1
      (2L, 1.2, 1.3),  // tiny, strictly inside bucket 1
      (3L, 2.0, 3.0),  // hi exactly on a bucket boundary — excludes 3.0
      (4L, 0.9, 0.9)   // empty
    ).toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 2L, 10L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals,
          "lo", "hi", width, axis = c => c)
        .select("pid", "iid").as[(Double, Long)].collect().sorted.toSeq
      val want = points.crossJoin(intervals)
        .where(col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Double, Long)].collect().sorted.toSeq
      assert(got === want, s"width=$width")
      assert(got.distinct === got, s"width=$width produced duplicates")
    }
    val b = Seq((10L, 1.1, 1.25), (11L, 2.9, 3.1), (12L, 0.0, 0.4))
      .toDF("bid", "blo", "bhi")
    for (width <- Seq(1L, 4L)) {
      val got = RangeJoin.intervalOverlap(
          intervals.toDF("aid", "alo", "ahi"), "alo", "ahi",
          b, "blo", "bhi", width, axis = c => c)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      val want = intervals.toDF("aid", "alo", "ahi").crossJoin(b)
        .where(col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"width=$width")
      assert(got.distinct === got, s"width=$width produced duplicates")
    }
  }

  test("gate entry q_range_join equals the naive predicate join") {
    val ev = Tables.read(spark, SparkTestSession.Sf, "events")
    val windows = ev
      .where(col("event_type") === "purchase" && col("event_id") % 20 === 0)
      .select(col("event_id").as("window_id"),
        date_trunc("second", col("ts")).as("lo"),
        (date_trunc("second", col("ts")) + expr("INTERVAL 1 HOUR")).as("hi"))
    val clicks = ev.where(col("event_type") === "click")
      .select(date_trunc("second", col("ts")).as("click_s"), col("value"))
    val naive = clicks.join(windows,
        col("click_s") >= col("lo") && col("click_s") < col("hi"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .as[(Long, Long, Double)].collect().toSet
    val bucketed = SparkEntry.queries("q_range_join")(spark, SparkTestSession.Sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(bucketed.nonEmpty)
    assert(bucketed === naive)
  }

  test("gate entry q_range_overlap equals the naive overlap theta join") {
    val ev = Tables.read(spark, SparkTestSession.Sf, "events")
    val a = ev.where(col("event_type") === "purchase" && col("event_id") % 20 === 0)
      .select(col("event_id").as("a_id"),
        date_trunc("second", col("ts")).as("a_lo"),
        (date_trunc("second", col("ts")) + expr("INTERVAL 1 HOUR")).as("a_hi"))
    val b = ev.where(col("event_type") === "view" && col("event_id") % 7 === 0)
      .select(col("event_id").as("b_id"),
        date_trunc("second", col("ts")).as("b_lo"),
        (date_trunc("second", col("ts")) + expr("INTERVAL 30 MINUTE")).as("b_hi"))
    val naive = a.crossJoin(b)
      .where(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .groupBy("a_id")
      .agg(count(lit(1)).as("n_overlaps"), min(col("b_lo")).as("first_b_lo"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    val bucketed = SparkEntry.queries("q_range_overlap")(spark, SparkTestSession.Sf)
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    assert(bucketed.nonEmpty)
    assert(bucketed === naive)
  }
}
