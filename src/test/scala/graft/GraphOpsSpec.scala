package graft

import graft.functions.{EventOps, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("changeIntervals: runs collapse, intervals chain, last is open") {
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 2L, "a", "2024-01-01 10:05:00"),
      (1L, 3L, "b", "2024-01-01 10:10:00"),
      (1L, 4L, "a", "2024-01-01 10:20:00"),
      (2L, 5L, "x", "2024-01-01 09:00:00")
    ).toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = EventOps.changeIntervals(ev, "user_id", "event_type", "ts", "event_id")
      .select("user_id", "event_type", "valid_from", "valid_to", "n_events", "is_current")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long, Boolean)]
      .collect().toSet
    assert(got === Set(
      (1L, "a", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:10:00")), 2L, false),
      (1L, "b", ts("2024-01-01 10:10:00"), Some(ts("2024-01-01 10:20:00")), 1L, false),
      (1L, "a", ts("2024-01-01 10:20:00"), None, 1L, true),
      (2L, "x", ts("2024-01-01 09:00:00"), None, 1L, true)))
  }

  test("changeIntervals: null attr is its own run (null-safe change flag)") {
    val ev = Seq(
      (1L, 1L, Some("a"), "2024-01-01 10:00:00"),
      (1L, 2L, None, "2024-01-01 10:05:00"),
      (1L, 3L, None, "2024-01-01 10:10:00"),
      (1L, 4L, Some("a"), "2024-01-01 10:15:00")
    ).toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = EventOps.changeIntervals(ev, "user_id", "event_type", "ts", "event_id")
      .select("event_type", "n_events", "is_current")
      .as[(Option[String], Long, Boolean)].collect().toSet
    assert(got === Set(
      (Some("a"), 1L, false), (None, 2L, false), (Some("a"), 1L, true)))
  }

  test("changeIntervals: timestamp ties break by the tie column") {
    val ev = Seq(
      (1L, 2L, "b", "2024-01-01 10:00:00"),
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 3L, "b", "2024-01-01 10:00:00")
    ).toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = EventOps.changeIntervals(ev, "user_id", "event_type", "ts", "event_id")
      .select("event_type", "n_events", "is_current")
      .as[(String, Long, Boolean)].collect().toSet
    // event_id order a,b,b → runs (a,1), (b,2 open)
    assert(got === Set(("a", 1L, false), ("b", 2L, true)))
  }

  test("triangleCounts: K4, squares, pendants, duplicate/reversed edges") {
    val edges = Seq(
      // K4 on 1-4: C(4,3) = 4 triangles, every node in 3
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 3L), (3L, 4L),              // duplicates/reversals collapse
      // square 10-13: no triangle
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      // star hub 20 with one closing edge: exactly one triangle
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L),
      (30L, 30L)                        // self loop: dropped
    ).toDF("u", "v")
    val got = graft.functions.Graph.triangleCounts(edges, "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      20L -> 1L, 21L -> 1L, 22L -> 1L))
  }

  /** Driver-side replay of the exact integer recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val m = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (u, v) => m(v) += r(u) / deg(u) }
      r = nodes.map(n => n -> (base + 85L * m(n) / 100L)).toMap
    }
    r
  }

  test("pageRankFixedPoint equals the driver replay on an asymmetric graph") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 3L),
      (5L, 6L) // separate pair; 6 is dangling (leaks mass)
    )
    val got = Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst",
      iters = 7).as[(Long, Long)].collect().toMap
    assert(got === refPageRank(edges, 7))
    // dangling sink keeps only base + damped in-mass; no out-contribution
    assert(got(6L) > 150000L)
  }

  test("pageRankFixedPoint: symmetric regular graph gives equal ranks; iters=0 is the seed") {
    // 4-cycle, both directions: every node has degree 2 — ranks stay equal
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = cyc ++ cyc.map(_.swap)
    val got = Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst",
      iters = 5).as[(Long, Long)].collect().toMap
    assert(got.values.toSet.size === 1)
    // conservation up to truncation: total ≈ n·scale, never above
    assert(got.values.sum <= 4L * 1000000L)
    val seed = Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst",
      iters = 0).as[(Long, Long)].collect().toMap
    assert(seed === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L))
  }

  test("acfStats: exact moments on a hand-computed series, per lag") {
    // series A: 1,2,3,4 — lag1 pairs (2,1),(3,2),(4,3); lag2 (3,1),(4,2)
    val s = Seq(("A", 0L, 1L), ("A", 1L, 2L), ("A", 2L, 3L), ("A", 3L, 4L))
      .toDF("k", "t", "v")
    val got = EventOps.acfStats(s, "k", "t", "v", maxLag = 2)
      .select("k", "lag_k", "n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy")
      .as[(String, Int, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    assert(got(1) === (("A", 1, 3L, 9L, 6L, 20.0, 29.0, 14.0)))
    assert(got(2) === (("A", 2, 2L, 7L, 3L, 11.0, 25.0, 5.0)))
  }

  test("acfStats: a period-2 series has negative lag-1 and perfect lag-2 covariance") {
    val s = (0L until 20L).map(i => ("P", i, if (i % 2 == 0) 10L else 0L))
      .toDF("k", "t", "v")
    val m = EventOps.acfStats(s, "k", "t", "v", maxLag = 2)
      .select("lag_k", "n", "sum_x", "sum_y", "sum_xy")
      .as[(Int, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // lag 1: x,y always one 10 and one 0 → sum_xy = 0 (perfect anti-phase)
    assert(m(1)._5 === 0.0)
    // lag 2: aligned → every even pair contributes 100
    assert(m(2)._5 === 9 * 100.0)
  }

  test("holtSmooth: hand-replayed recursion, negative trend divisions truncate") {
    // declining series forces negative (l_t − l_{t−1}) and negative b:
    // x = 100, 50, 10 with α=0.3, β=0.2, scale 1000
    //   t0: l=100000, b=0
    //   t1: l=(3·50000+7·100000)/10=85000; b=(2·(85000−100000)+0)/10=−3000
    //   t2: l=(3·10000+7·(85000−3000))/10=60400
    //       b=(2·(60400−85000)+8·(−3000))/10=(−49200−24000)/10=−7320
    val ts = (0 until 3).map(i =>
      java.sql.Timestamp.valueOf(s"2024-01-01 0$i:00:00"))
    val s = Seq(("A", ts(0), 100L), ("A", ts(1), 50L), ("A", ts(2), 10L))
      .toDF("k", "t", "v")
    val got = EventOps.holtSmooth(s, "k", "t", "v")
      .select("t", "x", "level_fp", "trend_fp", "forecast_fp")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(ts(0)) === ((ts(0), 100L, 100000L, 0L, 100000L)))
    assert(got(ts(1)) === ((ts(1), 50L, 85000L, -3000L, 82000L)))
    assert(got(ts(2)) === ((ts(2), 10L, 60400L, -7320L, 53080L)))
    // keys are independent: a second constant series is untouched
    val two = s.union(Seq(("B", ts(0), 5L), ("B", ts(1), 5L))
      .toDF("k", "t", "v"))
    val b5 = EventOps.holtSmooth(two, "k", "t", "v")
      .where(col("k") === "B").select("level_fp", "trend_fp")
      .as[(Long, Long)].collect().toSet
    assert(b5 === Set((5000L, 0L)))
  }

  test("cusumFlags: exact dev on a step series, flags only after the shift") {
    // 8 ticks: 0,0,0,0,10,10,10,10 — mean 5; CUSUM dips to -20 at i=4
    val s = (0L until 8L).map(i => ("S", i, if (i < 4) 0L else 10L))
      .toDF("k", "t", "v")
    val got = EventOps.cusumFlags(s, "k", "t", "v",
        lambdaNum = 1L, lambdaDen = 1L)
      .select("t", "x", "dev", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // dev_i = n·P_i − i·S = 8·P_i − 40·i
    assert(got(0L)._3 === -40L && got(3L)._3 === -160L)
    assert(got(7L)._3 === 0L)
    // |CUSUM_4| = 20 > 1·√40 ≈ 6.3 → flagged; last tick dev 0 → not
    assert(got(3L)._4 && got(4L)._4 && !got(7L)._4)
    // a flat series never flags (dev ≡ 0)
    val flat = (0L until 8L).map(i => ("F", i, 5L)).toDF("k", "t", "v")
    assert(EventOps.cusumFlags(flat, "k", "t", "v", 1L, 1L)
      .where(col("flagged")).count() === 0L)
  }

  test("linkPredictionRA: rare shared neighbors outscore common ones, hubs capped") {
    // bipartite: users 1..4 × items 10..13
    //   item 10: users {1,2}          deg 2 → each pair gets 500000
    //   item 11: users {1,2,3}        deg 3 → 333333 per pair
    //   item 12: users {1,2,3,4}      deg 4 → over maxDeg=3, dropped
    //   item 13: user  {4}            deg 1 → below minDeg, dropped
    val edges = Seq(
      (1L, 10L), (2L, 10L),
      (1L, 11L), (2L, 11L), (3L, 11L),
      (1L, 12L), (2L, 12L), (3L, 12L), (4L, 12L),
      (4L, 13L),
      (1L, 10L) // duplicate edge must not double-count
    ).toDF("u", "z")
    val got = Graph.linkPredictionRA(edges, "u", "z", maxDeg = 3L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === Map(
      (1L, 2L) -> ((2L, 833333L)),   // 500000 + 333333
      (1L, 3L) -> ((1L, 333333L)),
      (2L, 3L) -> ((1L, 333333L))))  // no pair through the capped hub 12
    // orientation: node_a < node_b always
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("mad outliers: exact medians, breakdown resistance, planted flags") {
    import graft.functions.EventOps
    // odd group: values 1..5 + one wild outlier; median stays 3,
    // MAD = median(|x-3|) over {2,1,0,1,2,9997} -> lower median 1
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("a", 10000L), ("b", 7L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val got = EventOps.madOutlierSummary(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // lower median of {1,2,3,4,5,10000} is 3 (cum*2>=total at 3)
    assert(got("a") === ((3L, 1L, 1L, 6L)))   // only 10000 flagged
    // constant group: MAD 0 -> nothing beats 0 threshold... except dev>0
    assert(got("b") === ((7L, 0L, 0L, 3L)))
  }

  test("lower median runs on the histogram, not raw rows") {
    import graft.functions.EventOps
    val df = Seq.fill(1000)(("a", 5L)).toDF("g", "v")
    val med = EventOps.lowerMedianByGroup(df, "g", "v", "m")
      .collect().head.getLong(1)
    assert(med === 5L)
    // the window input is the aggregated histogram: one row per value
    val plan = EventOps.lowerMedianByGroup(df, "g", "v", "m")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
  }

  test("ols trend: exact slope on a planted line, null den on constant x") {
    import graft.functions.EventOps
    // y = 3x + 7 exactly -> slope_ppm = 3_000_000
    val line = (0L to 9L).map(x => ("a", x, 3 * x + 7)) :+ (("b", 5L, 1L)) :+ (("b", 5L, 9L))
    val got = EventOps.olsTrend(line.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5), Option(r.get(6)).map(_.toString.toLong)))
      .toMap
    assert(got("a")._3 === Some(3000000L))
    // single x value: den = 0 -> slope undefined (null), not a crash
    assert(got("b")._2 === 0L && got("b")._3 === None)
  }

  test("quantile transform: min at 0 ppm, max at 1e6 for unique max") {
    import graft.functions.Profiling
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L))
      .toDF("g", "v")
    val got = Profiling.quantileTransform(df, "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // strictly-smaller counts: 10->0, 20->1, 30->3 of (n-1)=3
    assert(got === Map(10L -> 0L, 20L -> 333333L, 30L -> 1000000L))
  }

  test("kaplan-meier: textbook fixture with censoring") {
    import graft.functions.EventOps
    // subjects: events at t=1 (2 of 5), censored at t=2 (1), event at
    // t=3 (1), censored at t=4 (1)
    val df = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, false)).toDF("dur", "ev")
    val got = EventOps.kaplanMeier(df, "dur", "ev")
      .orderBy("duration")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // t=1: risk 5, events 2 -> S = 3/5 = 0.6
    // t=3: risk 2, events 1 -> S = 0.6 * 0.5 = 0.3
    assert(got === Seq((1L, 5L, 2L, 1.0 * (1.0 - 2.0 / 5.0)),
      (3L, 2L, 1L, (1.0 * (1.0 - 2.0 / 5.0)) * (1.0 - 1.0 / 2.0))))
  }
  test("kCore: triangle survives k=2, pendant drops, chain cascades to empty") {
    def und(pairs: (Long, Long)*) = {
      val df = pairs.toSeq.toDF("a", "b")
      df.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(df.select(col("b").as("src"), col("a").as("dst")))
    }
    // triangle 1-2-3 with pendant 4 on 1: 2-core = the triangle, every
    // member at core degree 2 (the pendant peels in round 1, nothing
    // cascades because triangle degrees stay at 2)
    val g1 = Graph.kCore(und((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)),
      "src", "dst", k = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(g1 === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // path 1-2-3-4 under k=2: endpoints peel, the removals CASCADE
    // inward round by round until nothing is left
    val g2 = Graph.kCore(und((1L, 2L), (2L, 3L), (3L, 4L)),
      "src", "dst", k = 2)
    assert(g2.count() === 0L)
    // k=1 keeps every non-isolated node with its full degree
    val g3 = Graph.kCore(und((1L, 2L), (2L, 3L)), "src", "dst", k = 1)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(g3 === Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }
  // pins the r11 visited-as-union-of-layers rewrite: min hop distances,
  // one row per reachable node (layers stay disjoint), hop bound honored,
  // unreachable nodes absent
  test("bfsLevels: hand graph distances, disjoint layers, hop bound") {
    def und(pairs: (Long, Long)*) = {
      val p = pairs.toDF("a", "b")
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    }
    // 1-2-3-4 path + branch 2-5, isolated pair 8-9; seeds {1}
    val e = und((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (8L, 9L))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsLevels(e, "src", "dst", seeds, "node", maxHops = 2)
      .as[(Long, Int)].collect().sorted.toSeq
    // node 4 is 3 hops out — beyond maxHops; 8/9 unreachable
    assert(got === Seq((1L, 0), (2L, 1), (3L, 2), (5L, 2)))
    // a cycle revisit must NOT duplicate a node at a later dist
    val cyc = und((1L, 2L), (2L, 3L), (1L, 3L))
    val got2 = Graph.bfsLevels(cyc, "src", "dst", seeds, "node", maxHops = 4)
      .as[(Long, Int)].collect().sorted.toSeq
    assert(got2 === Seq((1L, 0), (2L, 1), (3L, 1)))
  }

  test("coreness: hand graph, and membership agrees with kCore") {
    def und(pairs: (Long, Long)*) = {
      val p = pairs.toDF("a", "b")
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    }
    // triangle 1-2-3 with tail 3-4-5: triangle nodes are 2-core, the
    // tail is 1-core — the full decomposition in one call
    val g = und((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val c = Graph.coreness(g, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(c === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // K4 with a pendant: K4 nodes coreness 3, pendant 1
    val k4 = und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L))
    val c4 = Graph.coreness(k4, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(c4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 9L -> 1L))
    // cross-operator consistency: {coreness >= k} IS the k-core on the
    // fixture bipartite graph shape (small slice)
    val o = Tables.read(spark, SparkTestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.read(spark, SparkTestSession.Sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (col("l_suppkey").cast("long") + 10000000L).as("s")).distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val byCoreness = Graph.coreness(edges, "src", "dst")
      .where(col("coreness") >= 10).select("node")
      .as[Long].collect().toSet
    val byKcore = Graph.kCore(edges, "src", "dst", k = 10)
      .select("node").as[Long].collect().toSet
    assert(byCoreness === byKcore)
  }

  test("coreness: hot-node star fixture, and the oracle-unroll guard") {
    def und(pairs: (Long, Long)*) = {
      val p = pairs.toDF("a", "b")
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    }
    // celebrity star: one node with 20k neighbors — the shape that made
    // the pre-r11 row_number form sort the full neighbor list in one
    // task per round. Leaves are degree-1 so hub and plain leaves are
    // 1-core; leaf 1 additionally completes a K4 with three fresh
    // nodes, so those four are 3-core
    val hub = 0L
    val star = spark.range(1, 20001)
      .select(lit(hub).as("src"), col("id").as("dst"))
    val starUnd = star.unionByName(
      star.select(col("dst").as("src"), col("src").as("dst")))
    val k4 = und((1L, 30001L), (1L, 30002L), (1L, 30003L),
      (30001L, 30002L), (30001L, 30003L), (30002L, 30003L))
    val g = starUnd.unionByName(k4)
    // hotDegree forced low so the star hub routes through the capped-
    // histogram branch — the hybrid's hot path — while the K4 and
    // leaves take the ranked branch; the union must be the exact
    // decomposition
    val c = Graph.coreness(g, "src", "dst", hotDegree = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(c(hub) === 1L)           // 20k degree-1 neighbors → h-index 1
    assert(c(1L) === 3L)            // the leaf inside K4
    assert(c(30001L) === 3L && c(30002L) === 3L && c(30003L) === 3L)
    assert(c(2L) === 1L && c(20000L) === 1L)
    assert(c.size === 20004)
    // both routes bit-equal: default cutoff (no hot node → pure ranked
    // form) gives the identical map
    val cRanked = Graph.coreness(g, "src", "dst").as[(Long, Long)]
      .collect().toMap
    assert(cRanked === c)
    // the oracle-unroll contract fails LOUDLY, not as a hash mismatch:
    // this graph needs >0 rounds, so an unroll of 0 must be rejected
    val e = intercept[IllegalArgumentException] {
      Graph.coreness(g, "src", "dst", oracleUnroll = Some(0))
    }
    assert(e.getMessage.contains("unroll"))
  }

  test("coreness: histogram rounds are per-round bit-equal to a ranked replay") {
    def und(pairs: (Long, Long)*) = {
      val p = pairs.toDF("a", "b")
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    }
    // the pre-r12 ranked form, replayed round by round: per-dst desc
    // row_number, H = max min(rank, value). The shipped histogram form
    // must emit the identical value table EVERY round (H identity), so
    // the unrolled oracle keeps replaying bit-exactly.
    def rankedRounds(g: org.apache.spark.sql.DataFrame): Map[Int, Map[Long, Long]] = {
      import org.apache.spark.sql.expressions.Window
      val e = g.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
      var vals = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("v")).localCheckpoint(true)
      val w = Window.partitionBy("dst").orderBy(col("v").desc)
      val acc = scala.collection.mutable.Map[Int, Map[Long, Long]]()
      var prevSum = -1L
      var rounds = 0
      var converged = false
      while (!converged && rounds < 50) {
        val next = e.join(vals.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), col("v"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .groupBy(col("dst").as("node"))
          .agg(max(least(col("rnk"), col("v"))).as("v"))
          .localCheckpoint(true)
        acc(rounds + 1) = next.as[(Long, Long)].collect().toMap
        val s = next.agg(sum(col("v"))).head().getLong(0)
        if (s == prevSum) converged = true
        else { prevSum = s; vals = next; rounds += 1 }
      }
      acc.toMap
    }
    def histRounds(g: org.apache.spark.sql.DataFrame): Map[Int, Map[Long, Long]] = {
      val acc = scala.collection.mutable.Map[Int, Map[Long, Long]]()
      Graph.coreness(g, "src", "dst",
        roundProbe = (i, df) => acc(i) = df.as[(Long, Long)].collect().toMap)
      acc.toMap
    }
    def check(g: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val r = rankedRounds(g)
      val h = histRounds(g)
      assert(r.keySet === h.keySet, s"$tag: round sets differ")
      r.keySet.foreach { i =>
        assert(h(i) === r(i), s"$tag: round $i diverged")
      }
    }
    // K4 + pendant chain — several rounds, ties in the desc sort
    check(und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L), (9L, 10L), (10L, 11L), (11L, 12L)), "hand")
    // the declared query's exact bipartite fixture shape
    val o = Tables.read(spark, SparkTestSession.Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.read(spark, SparkTestSession.Sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (col("l_suppkey").cast("long") + 10000000L).as("s")).distinct()
    check(pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst"))),
      "fixture")
  }

  test("ssspBounded: hand-relaxed weighted paths, min over parallel routes") {
    // 1 -2-> 2 -3-> 3, and a direct 1 -9-> 3: 4 rounds must pick 5
    // (via 2), not 9; node 4 unreachable within the bound stays absent
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 9L),
      (5L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.ssspBounded(edges, "src", "dst", "w",
        seeds, "node", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
    // rounds = 1 can only use single edges: direct 9 wins for node 3
    val one = Graph.ssspBounded(edges, "src", "dst", "w",
        seeds, "node", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one === Map(1L -> 0L, 2L -> 2L, 3L -> 9L))
  }
}
