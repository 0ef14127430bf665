package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Union-find over (a, b) edge pairs as a mergeable aggregate — connected
  * components for graphs whose edges are CONFINED to the aggregation key
  * (one blocking key per record ⇒ every edge stays inside its block).
  * `groupBy(block).agg(unionFind(a, b))` labels a whole blocked graph in
  * ONE shuffle, replacing the iterative large-star/small-star loop (4
  * shuffles + 2 checkpoints + 1 fingerprint action PER ROUND) that the
  * general [[graft.functions.Components]] needs for arbitrary graphs.
  *
  * Buffer = parent-pointer forest over the block's node ids. Memory is
  * O(nodes in block) — bounded whenever the caller bounds its blocks
  * (EntityResolution's `maxBlock` cap; LSH's bucket caps), which is the
  * only regime this operator is FOR: an unbounded hot block belongs to
  * the iterative loop, whose per-round state is O(1) per node. Merge
  * replays the other buffer's (node → parent) entries as union edges —
  * parent chains carry exactly the connectivity, so partial buffers merge
  * associatively and map-side combine is safe.
  *
  * Output: `array<struct<node:bigint, component:bigint>>`, component =
  * min member id (the [[graft.functions.Components]] labeling contract,
  * so callers and oracles are interchangeable).
  */
case class UnionFindPairs(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("node", LongType, nullable = false),
      StructField("component", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"graft_union_find requires (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  private def find(b: scala.collection.mutable.LongMap[Long], x0: Long): Long = {
    var x = x0
    var p = b.getOrElse(x, x)
    while (p != x) { x = p; p = b.getOrElse(x, x) }
    // path compression
    var y = x0
    while (y != x) { val n = b.getOrElse(y, y); b.update(y, x); y = n }
    x
  }

  private def union(b: scala.collection.mutable.LongMap[Long],
                    u: Long, v: Long): Unit = {
    // ensure both nodes exist so eval() emits isolated endpoints too
    if (!b.contains(u)) b.update(u, u)
    if (!b.contains(v)) b.update(v, v)
    val ru = find(b, u); val rv = find(b, v)
    if (ru != rv) {
      // root at the smaller id: keeps chains short enough in practice
      // (bounded blocks) and makes roots deterministic
      if (ru < rv) b.update(rv, ru) else b.update(ru, rv)
    }
  }

  override def update(b: scala.collection.mutable.LongMap[Long],
                      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val l = left.eval(input); val r = right.eval(input)
    if (l != null && r != null)
      union(b, l.asInstanceOf[Long], r.asInstanceOf[Long])
    b
  }

  override def merge(b: scala.collection.mutable.LongMap[Long],
                     other: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    other.foreach { case (n, p) => union(b, n, p) }
    b
  }

  override def eval(b: scala.collection.mutable.LongMap[Long]): Any = {
    // component label = min member id; with smaller-id rooting the root
    // IS the minimum, but compute the min explicitly so correctness
    // never leans on the rooting heuristic
    // snapshot keys first: find()'s path compression mutates values and
    // must not run under a live LongMap iterator
    val keys = new Array[Long](b.size)
    var i = 0
    b.foreachKey { n => keys(i) = n; i += 1 }
    val minOfRoot = scala.collection.mutable.LongMap.empty[Long]
    keys.foreach { n =>
      val r = find(b, n)
      val cur = minOfRoot.getOrElse(r, Long.MaxValue)
      if (n < cur) minOfRoot.update(r, n)
    }
    val rows = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      val n = keys(i)
      rows(i) = InternalRow(n, minOfRoot(find(b, n)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (n, p) => out.writeLong(n); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { b.update(in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): UnionFindPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UnionFindPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): UnionFindPairs =
    copy(left = c(0), right = c(1))
  override def prettyName: String = "graft_union_find"
}

object UnionFindPairs {
  def unionFind(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      UnionFindPairs(org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b))
        .toAggregateExpression())
}
