package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf attaches the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (1L, 101L, ts("2024-01-01 10:00:00")), // exactly at a quote ts
      (1L, 102L, ts("2024-01-01 09:00:00")), // before any quote
      (2L, 200L, ts("2024-01-01 10:30:00"))
    ).toDF("key", "trade_id", "t")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:03"), 11.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0)
    ).toDF("key", "t", "price")

    val out = AsOfJoin.asOf(trades, quotes, "key", "t", "t", Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(100L) === Some(11.0)) // latest quote ≤ 10:00:05
    assert(out(101L) === Some(10.0)) // quote AT the trade ts counts
    assert(out(102L) === None)       // no quote yet
    assert(out(200L) === Some(20.0)) // per-key isolation
  }

  test("multiple payload columns carry together") {
    val l = Seq((1L, 1L, ts("2024-01-01 01:00:00"))).toDF("key", "id", "t")
    val r = Seq((1L, ts("2024-01-01 00:30:00"), "cfgA", 7))
      .toDF("key", "t", "name", "version")
    val row = AsOfJoin.asOf(l, r, "key", "t", "t", Seq("name", "version"))
      .select("asof_name", "asof_version").collect()(0)
    assert(row.getString(0) === "cfgA" && row.getInt(1) === 7)
  }

  // The custom physical operator (LogicalPlan + Strategy + merge-join
  // SparkPlan) must agree with the window-composition form on the same
  // inputs — including the ≤ tie rule and unmatched-left nulls.
  test("custom AsOfJoinExec agrees with the window composition") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (1L, 101L, ts("2024-01-01 10:00:00")),
      (1L, 102L, ts("2024-01-01 09:00:00")),
      (2L, 200L, ts("2024-01-01 10:30:00")),
      (3L, 300L, ts("2024-01-01 11:00:00")) // key with no right rows at all
    ).toDF("key", "trade_id", "t")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:03"), 11.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0),
      (4L, ts("2024-01-01 00:00:00"), 40.0) // right-only key
    ).toDF("key", "t", "price")

    val rq = quotes.toDF("qkey", "qt", "price")
    val got = graft.plans.AsOfJoinPlan.asOf(trades, rq,
      leftKey = "key", rightKey = "qkey", leftTime = "t", rightTime = "qt")
    val rows = got.select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    val expected = AsOfJoin.asOf(trades, quotes, "key", "t", "t", Seq("price"))
      .select("trade_id", "asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows === expected)
    assert(rows(300L) === None)

    // the plan really is the custom exec, fed by per-side sorts
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"expected the custom operator in the plan:\n$plan")
  }

  // Bucketed-table layout + the custom operator: both sides bucketed on
  // the key satisfy AsOfJoinExec's ClusteredDistribution, so the plan has
  // NO shuffle exchange — only local per-partition sorts. This is the
  // operator's 100 TB story: a point-in-time lookup against a maintained
  // bucketed state table never reshuffles either side.
  test("custom as-of over bucketed tables plans without a shuffle") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val ev = Tables.read(spark, SparkTestSession.Sf, "events")
      .withColumn("ts", date_trunc("second", col("ts")))
    try {
      ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
        .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id", "ts")
        .saveAsTable("asof_l_b")
      ev.filter(col("event_type") === "click")
        .selectExpr("user_id AS c_user", "ts AS c_ts", "event_id AS click_id")
        .write.mode("overwrite").bucketBy(4, "c_user").sortBy("c_user", "c_ts")
        .saveAsTable("asof_r_b")

      val out = graft.plans.AsOfJoinPlan.asOf(
        spark.table("asof_l_b"), spark.table("asof_r_b"),
        "user_id", "c_user", "ts", "c_ts")
      val gotRows = out.select("event_id", "c_ts")
        .as[(Long, Option[Timestamp])].collect().toMap
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed as-of must not shuffle either side:\n$plan")

      val unbucketed = graft.plans.AsOfJoinPlan.asOf(
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts"),
        ev.filter(col("event_type") === "click")
          .selectExpr("user_id AS c_user", "ts AS c_ts", "event_id AS click_id"),
        "user_id", "c_user", "ts", "c_ts")
        .select("event_id", "c_ts").as[(Long, Option[Timestamp])]
        .collect().toMap
      assert(gotRows === unbucketed)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l_b")
      spark.sql("DROP TABLE IF EXISTS asof_r_b")
    }
  }

  // direction / tolerance variants + in-merge null handling
  test("forward / nearest directions and tolerance") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")), // back 10:00:03, fwd 10:00:10
      (1L, 101L, ts("2024-01-01 10:00:00")), // exact-ts quote: both dirs hit it
      (1L, 102L, ts("2024-01-01 09:00:00")), // nothing before, fwd 10:00:00
      (2L, 200L, ts("2024-01-01 11:00:00"))  // nothing after, back 10:00:00
    ).toDF("key", "trade_id", "t")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:03"), 11.0),
      (1L, ts("2024-01-01 10:00:10"), 12.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0)
    ).toDF("qkey", "qt", "price")

    def run(dir: String, tol: Option[Long] = None) =
      graft.plans.AsOfJoinPlan.asOf(trades, quotes,
          "key", "qkey", "t", "qt", direction = dir, tolerance = tol)
        .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap

    val fwd = run("forward")
    assert(fwd(100L) === Some(12.0)) // first quote ≥ 10:00:05
    assert(fwd(101L) === Some(10.0)) // quote AT the trade ts counts forward too
    assert(fwd(102L) === Some(10.0))
    assert(fwd(200L) === None)       // nothing after 11:00

    val near = run("nearest")
    assert(near(100L) === Some(11.0)) // back dist 2s < fwd dist 5s
    assert(near(101L) === Some(10.0)) // dist 0
    assert(near(102L) === Some(10.0)) // only forward exists
    assert(near(200L) === Some(20.0)) // only backward exists

    // 30-minute tolerance (micros): 200's backward quote is 1h away → null
    val tol = run("backward", Some(30L * 60 * 1000000))
    assert(tol(100L) === Some(11.0))
    assert(tol(200L) === None)

    // nearest ties break backward
    val tieTrades = Seq((9L, 900L, ts("2024-01-01 10:00:05"))).toDF("key", "trade_id", "t")
    val tieQuotes = Seq(
      (9L, ts("2024-01-01 10:00:00"), 1.0),
      (9L, ts("2024-01-01 10:00:10"), 2.0)).toDF("qkey", "qt", "price")
    val tie = graft.plans.AsOfJoinPlan.asOf(tieTrades, tieQuotes,
        "key", "qkey", "t", "qt", direction = "nearest")
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(tie(900L) === Some(1.0))
  }

  // Payload-bearing duplicates at the SAME right timestamp: forward and
  // nearest are documented to return the FIRST right row with ts ≥ lts,
  // which the ts-only oracles cannot distinguish — pin it on the payload.
  test("forward/nearest return the first of equal-ts right duplicates") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // lands exactly on the dup run
      (1L, 101L, ts("2024-01-01 09:59:00")), // dup run is its forward head
      (1L, 102L, ts("2024-01-01 10:01:00"))  // dup run is its backward carry
    ).toDF("key", "trade_id", "t")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "first"),
      (1L, ts("2024-01-01 10:00:00"), "second"),
      (1L, ts("2024-01-01 10:00:00"), "third")
    ).toDF("qkey", "qt", "tag")

    def run(dir: String) =
      graft.plans.AsOfJoinPlan.asOf(trades, quotes,
          "key", "qkey", "t", "qt", direction = dir)
        .select("trade_id", "tag").as[(Long, Option[String])].collect().toMap

    // which physical duplicate sorts first is engine-internal (equal sort
    // keys), so pin CONSISTENCY: an exact-ts left row must return the same
    // head-of-run row that an earlier left row sees as its forward
    // candidate — the pre-fix behavior returned the run's LAST row for the
    // exact-ts left and its FIRST for the earlier left.
    val fwd = run("forward")
    assert(fwd(100L).isDefined && fwd(100L) === fwd(101L),
      s"exact-ts forward must take the head of the equal-ts run: $fwd")
    assert(fwd(102L) === None)
    val near = run("nearest")
    assert(near(100L) === fwd(100L))
    // backward carry keeps last-of-equal (the documented carry semantic):
    // same row an after-the-run left row inherits, distinct from the head
    val back = run("backward")
    assert(back(100L).isDefined && back(100L) === back(102L))
    assert(back(100L) !== fwd(100L))
  }

  test("null keys/timestamps are handled inside the merge") {
    val trades = Seq(
      (Some(1L), 100L, Some(ts("2024-01-01 10:00:05"))),
      (None, 101L, Some(ts("2024-01-01 10:00:00"))), // null key
      (Some(1L), 102L, None)                          // null ts
    ).toDF("key", "trade_id", "t")
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 10.0),
      (None, Some(ts("2024-01-01 09:00:00")), 66.0),  // null-key right row
      (Some(1L), None, 77.0)                          // null-ts right row
    ).toDF("qkey", "qt", "price")

    val out = graft.plans.AsOfJoinPlan.asOf(trades, quotes,
        "key", "qkey", "t", "qt")
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(100L) === Some(10.0)) // normal match unaffected
    assert(out(101L) === None)       // null key joins nothing, row survives
    assert(out(102L) === None)       // null ts joins nothing, row survives
  }

  // fixture-scale equivalence on the events table (purchases ← clicks):
  // the custom merge operator and the window composition agree row-for-row
  test("custom AsOfJoinExec matches the window form on fixture events") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.read(spark, SparkTestSession.Sf, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .selectExpr("user_id AS c_user", "ts AS c_ts", "event_id AS click_id")

    val custom = graft.plans.AsOfJoinPlan.asOf(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTime = "ts", rightTime = "c_ts")
      .select("event_id", "c_ts").as[(Long, Option[Timestamp])]
      .collect().toMap
    val window = AsOfJoin.asOf(purchases,
        clicks.selectExpr("c_user AS user_id", "c_ts", "click_id"),
        "user_id", "ts", "c_ts", Seq("c_ts"))
      .select("event_id", "asof_c_ts").as[(Long, Option[Timestamp])]
      .collect().toMap
    assert(custom.size === window.size)
    assert(custom === window)
  }
}
