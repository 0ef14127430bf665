package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k of a long column — the k SMALLEST distinct values,
  * ascending. A `TypedImperativeAggregate` whose buffer never exceeds k
  * entries, so capping a pathological LSH bucket costs O(k) memory per
  * aggregation buffer and one shuffle, unlike a row_number window (extra
  * sort stage) or collect-then-slice (unbounded buffer).
  *
  * Commutative + associative + idempotent (set-min semantics), so any
  * partial/final merge tree yields the same result — safe map-side.
  * Equivalent, for `groupBy(bucket)`, to
  * `sort_array(collect_list(id))[1..k]` with bounded memory.
  */
case class BottomKLongs(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // fail at ANALYSIS, not with an executor ClassCastException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bottom_k requires a BIGINT column, got ${other.sql} — cast or use the window-cap form")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(b: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    b.add(v)
    if (b.size > k) b.remove(b.last())
  }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKLongs =
    copy(child = c.head)
  override def prettyName: String = "graft_bottom_k"
}

object BottomKLongs {
  def bottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BottomKLongs(org.apache.spark.sql.GraftBridge.expression(c), k)
        .toAggregateExpression())
}

/** Bounded bottom-k of (key: long, payload: long) pairs ordered by key —
  * the k smallest distinct keys, each carrying its payload, ascending.
  * Same bounded-buffer/merge-anywhere properties as [[BottomKLongs]];
  * used to cap LSH buckets whose members carry a signature
  * (SimHash: (id, sig)). Output `array<struct<id:long, payload:long>>`.
  */
case class BottomKPairs(
    keyExpr: Expression, payloadExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (keyExpr.dataType, payloadExpr.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (kt, pt) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bottom_k_pairs requires BIGINT columns, got (${kt.sql}, ${pt.sql})")
    }

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def offer(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                    key: Long, payload: Long): Unit = {
    val existing = b.get(key)
    // duplicate keys keep the SMALLEST payload: set-min semantics on both
    // fields makes the result independent of update/merge order
    if (existing == null || payload < existing) {
      b.put(key, payload)
      if (b.size > k) b.remove(b.lastKey())
    }
  }

  override def update(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null)
      offer(b, kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); offer(b, e.getKey, e.getValue) }
    b
  }

  override def eval(b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](b.size)
    val it = b.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { b.put(in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKPairs =
    copy(keyExpr = c(0), payloadExpr = c(1))
  override def prettyName: String = "graft_bottom_k_pairs"
}

object BottomKPairs {
  def bottomKPairs(key: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BottomKPairs(org.apache.spark.sql.GraftBridge.expression(key),
        org.apache.spark.sql.GraftBridge.expression(payload), k)
        .toAggregateExpression())
}
