package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (t-digest-style, Dunning & Ertl): clusters of
  * (mean, weight) kept small near the tails and coarse in the middle via
  * the scale-function size bound w ≤ 4·n·q(1−q)/δ, giving relative-accuracy
  * quantile estimates from O(δ) space — the one-pass, merge-anywhere
  * structure for percentiles over 100 TB (exact sort-based percentiles
  * need a full shuffle; a digest is a few KB per partial buffer).
  *
  * Inputs are buffered and sorted before each clustering pass, which
  * removes within-batch arrival-order effects; across merge trees the
  * exact cluster boundaries can still differ (inherent to any compressed
  * digest — Spark's own percentile_approx shares the property), but every
  * estimate stays within the δ accuracy bound, which is what the spec
  * asserts. For exact, order-independent percentiles use the sort-based
  * `percentile` (q_percentile); this digest is the one-pass scale path.
  */
case class QuantileDigest(
    child: Expression, quantiles: Seq[Double], delta: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileDigest.Digest] {

  require(delta >= 10, s"delta must be >= 10, got $delta")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QuantileDigest.Digest =
    new QuantileDigest.Digest(delta)

  override def update(b: QuantileDigest.Digest, input: InternalRow): QuantileDigest.Digest = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => other.toString.toDouble
    })
    b
  }

  override def merge(b: QuantileDigest.Digest, other: QuantileDigest.Digest): QuantileDigest.Digest = {
    b.mergeWith(other); b
  }

  override def eval(b: QuantileDigest.Digest): Any =
    new GenericArrayData(quantiles.map(b.quantile).toArray)

  override def serialize(b: QuantileDigest.Digest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileDigest.Digest =
    QuantileDigest.Digest.deserialize(bytes, delta)

  override def withNewMutableAggBufferOffset(o: Int): QuantileDigest =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileDigest =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileDigest =
    copy(child = c.head)
  override def prettyName: String = "graft_tdigest"
}

object QuantileDigest {

  /** Digest state: merged clusters (sorted by mean) + an unmerged input
    * buffer, compressed when the buffer reaches `compressAt`.
    */
  final class Digest(delta: Int) {
    private var means = new Array[Double](0)
    private var weights = new Array[Long](0)
    private var buf = new Array[Double](64)
    private var nBuf = 0
    private val compressAt = delta * 8

    def add(v: Double): Unit = {
      if (nBuf == buf.length) {
        if (nBuf >= compressAt) compress()
        else buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      }
      buf(nBuf) = v; nBuf += 1
    }

    def mergeWith(other: Digest): Unit = {
      other.compress()
      var i = 0
      while (i < other.means.length) {
        // re-insert other's clusters as weighted points; clustering happens
        // on the sorted union, so merge order cannot change the result
        appendCluster(other.means(i), other.weights(i))
        i += 1
      }
      compress()
    }

    private var extraMeans = new Array[Double](0)
    private var extraWeights = new Array[Long](0)
    private def appendCluster(m: Double, w: Long): Unit = {
      extraMeans = extraMeans :+ m
      extraWeights = extraWeights :+ w
    }

    def compress(): Unit = {
      if (nBuf == 0 && extraMeans.isEmpty) return
      // gather all (mean, weight) points: merged clusters + buffer + extras
      val n = means.length + nBuf + extraMeans.length
      val ms = new Array[Double](n)
      val ws = new Array[Long](n)
      System.arraycopy(means, 0, ms, 0, means.length)
      System.arraycopy(weights, 0, ws, 0, means.length)
      var i = 0
      while (i < nBuf) {
        ms(means.length + i) = buf(i); ws(means.length + i) = 1L; i += 1
      }
      i = 0
      while (i < extraMeans.length) {
        ms(means.length + nBuf + i) = extraMeans(i)
        ws(means.length + nBuf + i) = extraWeights(i)
        i += 1
      }
      // sort points by mean (stable for determinism: sort (mean, weight))
      val idx = (0 until n).sortBy(j => (ms(j), ws(j))).toArray
      val total = ws.sum.toDouble
      val outM = new Array[Double](n)
      val outW = new Array[Long](n)
      var nOut = 0
      var accW = 0L // weight before current cluster
      var cm = ms(idx(0)); var cw = ws(idx(0))
      var j = 1
      while (j < n) {
        val m = ms(idx(j)); val w = ws(idx(j))
        val q = (accW + cw / 2.0) / total
        val sizeBound = math.max(1.0, 4.0 * total * q * (1 - q) / delta)
        if (cw + w <= sizeBound) {
          // weighted mean update keeps the cluster centroid exact
          cm = (cm * cw + m * w) / (cw + w); cw += w
        } else {
          outM(nOut) = cm; outW(nOut) = cw; nOut += 1
          accW += cw; cm = m; cw = w
        }
        j += 1
      }
      outM(nOut) = cm; outW(nOut) = cw; nOut += 1
      means = java.util.Arrays.copyOf(outM, nOut)
      weights = java.util.Arrays.copyOf(outW, nOut)
      nBuf = 0
      extraMeans = new Array[Double](0)
      extraWeights = new Array[Long](0)
    }

    /** Quantile estimate by linear interpolation between cluster centroids. */
    def quantile(q: Double): Double = {
      compress()
      if (means.isEmpty) return Double.NaN
      if (means.length == 1) return means(0)
      val total = weights.sum.toDouble
      val target = q * total
      var acc = 0.0
      var i = 0
      while (i < means.length) {
        val mid = acc + weights(i) / 2.0
        if (target <= mid) {
          if (i == 0) return means(0)
          val prevMid = acc - weights(i - 1) / 2.0
          val t = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + t * (means(i) - means(i - 1))
        }
        acc += weights(i)
        i += 1
      }
      means(means.length - 1)
    }

    def nClusters: Int = { compress(); means.length }

    def serialize(): Array[Byte] = {
      compress()
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(means.length)
      var i = 0
      while (i < means.length) {
        out.writeDouble(means(i)); out.writeLong(weights(i)); i += 1
      }
      out.flush(); bos.toByteArray
    }
  }

  object Digest {
    def deserialize(bytes: Array[Byte], delta: Int): Digest = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val d = new Digest(delta)
      var i = 0
      while (i < n) { d.appendCluster(in.readDouble(), in.readLong()); i += 1 }
      d.compress()
      d
    }
  }

  /** `array<double>` of quantile estimates of `c` at `qs`. */
  def tdigest(c: Column, qs: Seq[Double], delta: Int = 100): Column =
    org.apache.spark.sql.GraftBridge.column(
      QuantileDigest(org.apache.spark.sql.GraftBridge.expression(c), qs, delta)
        .toAggregateExpression())
}
