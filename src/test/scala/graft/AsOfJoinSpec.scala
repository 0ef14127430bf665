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
}
