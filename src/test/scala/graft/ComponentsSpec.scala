package graft

import graft.functions.{Components, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side union-find reference for small graphs. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // a root's parent may still exceed the true min via rank-less union —
    // the ra<rb rule above keeps roots minimal, path-compress to settle
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chains, cliques, crossed ids, isolated pairs — equals union-find") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),     // chain, min 1
      (10L, 11L), (11L, 12L), (10L, 12L),          // triangle, min 10
      (20L, 30L), (30L, 25L),                      // crossed ordering
      (100L, 99L),                                 // single reversed pair
      (7L, 7L)                                     // self loop: dropped
    )
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = ufComponents(edges.filter(e => e._1 != e._2))
    assert(got === want)
    // component label is the min member id
    got.groupBy(_._2).foreach { case (comp, ms) =>
      assert(ms.keys.min === comp)
    }
  }

  test("small-graph union-find cutover ≡ the iterative star loop") {
    // the r11 cutover routes graphs under graft.cc.localMax through ONE
    // global UnionFindPairs aggregation; forcing the threshold negative
    // pins the loop's labels bit-identical to the aggregate's on random
    // graphs (incl. chains — worst case for min propagation) and on the
    // mergeComponents quotient path
    val rnd = new scala.util.Random(31)
    val edges = (Seq.fill(800)(
        (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)) ++
        (500L until 560L).map(i => (i, i + 1)))   // appended chain
      .filter(e => e._1 != e._2)
    val df = edges.toDF("a", "b").repartition(16)
    val fast = Components.connectedComponents(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    val old = sys.props.put("graft.cc.localMax", "-1")
    try {
      val loop = Components.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(fast === loop)
    } finally {
      old match {
        case Some(v) => sys.props.put("graft.cc.localMax", v)
        case None => sys.props.remove("graft.cc.localMax")
      }
    }
    assert(fast === ufComponents(edges))
  }

  test("long chain converges within the iteration budget (log², not diameter)") {
    // a 300-node path has diameter 299: naive min-propagation needs ~300
    // joins; large-star/small-star must settle in well under maxIter=20
    val n = 300L
    val edges = (0L until n - 1).map(i => (i + 1, i + 2)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 === 1L))
  }

  test("random graph equals union-find") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(500)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2)
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === ufComponents(edges))
  }

  test("100k-edge hub: degree skew never builds a neighborhood buffer") {
    // a single node adjacent to 100k others — the degree-skew shape that
    // would OOM any collect_list-of-neighbors formulation; the groupBy-min
    // + join rounds handle it with O(1) aggregation buffers
    val edges = spark.range(1L, 100001L)
      .select(lit(0L).as("a"), col("id").as("b"))
    val got = Components.connectedComponents(edges, "a", "b")
    assert(got.count() === 100001L)
    assert(got.where(col("component") =!= 0L).count() === 0L)
  }

  // Incremental merge must equal from-scratch over the edge union —
  // including the hard cases: a new edge bridging two old components,
  // a new node joining an old component, brand-new components, a new
  // node whose id undercuts an old component's minimum (relabeling an
  // untouched-by-id component), and already-connected duplicates.
  test("mergeComponents equals from-scratch on the union (random graphs)") {
    val rng = new scala.util.Random(1234)
    (0 until 3).foreach { trial =>
      val n = 200
      val all = (0 until 300).map { _ =>
        (rng.nextInt(n).toLong + 1, rng.nextInt(n).toLong + 1) }
      val (oldE, newE) = all.splitAt(180)
      val labels = Components.connectedComponents(
        oldE.toDF("a", "b"), "a", "b")
      val got = Components.mergeComponents(labels, newE.toDF("a", "b"),
          "a", "b").as[(Long, Long)].collect()
      assert(got.length === got.map(_._1).distinct.length,
        s"trial $trial: duplicate node labels")
      val full = Components.connectedComponents(all.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // emitted set = labeled-old ∪ new-edge endpoints; from-scratch
      // emits nodes of all non-self edges — compare on the intersection
      // and require every from-scratch node to be covered unless it only
      // ever appeared in self-edges
      val gotMap = got.toMap
      full.foreach { case (node, comp) =>
        assert(gotMap.get(node).contains(comp),
          s"trial $trial node $node: got ${gotMap.get(node)}, want $comp")
      }
      // nodes only in self-edges label themselves
      gotMap.keys.filterNot(full.contains).foreach { node =>
        assert(gotMap(node) === node) }
    }
  }

  test("mergeComponents: new min id relabels an existing component") {
    val labels = Components.connectedComponents(
      Seq((10L, 12L), (12L, 14L)).toDF("a", "b"), "a", "b")
    val got = Components.mergeComponents(labels,
        Seq((3L, 14L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 3L, 12L -> 3L, 14L -> 3L, 3L -> 3L))
  }

  test("mergeComponents: untouched components pass through unchanged") {
    val labels = Components.connectedComponents(
      Seq((1L, 2L), (50L, 60L)).toDF("a", "b"), "a", "b")
    val got = Components.mergeComponents(labels,
        Seq((100L, 101L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 60L -> 50L,
      100L -> 100L, 101L -> 100L))
  }

  test("blockLocalComponents equals the iterative loop on blocked graphs") {
    // random block-confined graphs: nodes carry their block in the high
    // bits, edges only join same-block nodes — the EntityResolution shape
    val rnd = new scala.util.Random(7)
    val edges = (0 until 4000).map { _ =>
      val blk = rnd.nextInt(50).toLong
      val a = blk * 1000 + rnd.nextInt(40)
      val b = blk * 1000 + rnd.nextInt(40)
      (blk, a, b)
    }.filter { case (_, a, b) => a != b }
    val df = edges.toDF("blk", "a", "b").repartition(16) // force merges
    val fast = Components.blockLocalComponents(df, "a", "b", "blk")
      .as[(Long, Long)].collect().toMap
    val slow = Components.connectedComponents(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(fast === slow)
    // reference union-find agrees too
    val ref = ufComponents(edges.map { case (_, a, b) => (a, b) })
    assert(fast === ref)
  }

  test("er_resolve labels: block-local path ≡ generic path end to end") {
    val docs = graft.Tables.read(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").cast("long").as("id"),
        col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    def resolveWith(maxBlock: Long) =
      graft.functions.EntityResolution.resolve(docs, "id", "name",
        expr("substring(name, 10, 8)"), maxEdits = 2,
        rankCol = "acctbal", maxBlock = maxBlock)
        .select("id", "entity_id", "canonical_id", "n_members")
        .as[(Long, Long, Long, Long)].collect().toSet
    // maxBlock>0 takes the single-shuffle union-find path; compare
    // against the iterative path on the same (uncapped-equivalent) data:
    // blocks here are all ≤ 1000, so the cap is inert and only the CC
    // implementation differs
    assert(resolveWith(1000L) === resolveWith(0L))
  }

  test("empty edge list yields empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(empty, "a", "b").count() === 0L)
  }

  test("gate entry clusters minhash pairs; non-dup docs are their own rep") {
    val out = SparkEntry.queries("dedup_components")(spark, SparkTestSession.Sf)
      .as[(Long, Long)].collect().toMap
    val nDocs = Tables.read(spark, SparkTestSession.Sf, "documents").count()
    assert(out.size.toLong === nDocs)
    val pairs = Dedup.minhashDupPairs(
        Tables.read(spark, SparkTestSession.Sf, "documents"),
        "text", "doc_id", k = 3, nPerm = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val want = ufComponents(pairs.toSeq)
    // paired docs carry the union-find label; unpaired docs label themselves
    out.foreach { case (doc, rep) =>
      assert(rep === want.getOrElse(doc, doc), s"doc $doc")
    }
  }
}
