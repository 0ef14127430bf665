package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distributed Gram / covariance SUFFICIENT STATISTICS over an integer-
  * quantized vector column — the one aggregate PCA, whitening, and
  * feature-drift monitors all start from:
  *
  *   n,  Σ qᵢ  (per dimension),  Σ qᵢ·qⱼ  (upper triangle, i ≤ j)
  *
  * from which cov(i,j) = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / (n²·scale²) is one exact
  * division away. The input must already be quantized to Longs (e.g.
  * `floor(x · 2²⁰)` — a power-of-two scale is lossless for float32, so
  * the moments are EXACT integers and hash-check across engines;
  * float accumulation would be reduce-order-dependent).
  *
  * The buffer is one flat Long array of size 1 + dim + dim(dim+1)/2
  * (~16 KB at dim = 64). Update is the row-local d²/2 multiply-add —
  * the O(d²) work a BLAS `syrk` does per row, here in one pass over
  * each partition; merge is element-wise vector addition, so any
  * partial/final merge tree is exact and map-side combine applies.
  * Compare the relational alternative (explode dim²/2 struct rows per
  * vector, groupBy (i,j)): same result, but it shuffles d²/2 rows PER
  * VECTOR — this aggregate shuffles one ~16 KB buffer per partition
  * regardless of corpus size, the difference between feasible and not
  * at 100 TB. Bit-equality with the explode form is spec-checked.
  *
  * Overflow headroom: |q| ≤ m·2²⁰ for embeddings bounded by m, so each
  * product is ≤ m²·2⁴⁰ and Long holds ~2²³/m² row-contributions per
  * moment (≈ 500 B rows for unit-ish embeddings); past that, shard the
  * corpus and merge the per-shard moment TABLES in DECIMAL(38).
  *
  * Output: one `array<struct<i, j, sum_i, sum_j, sum_ij, n>>` value —
  * the upper triangle row-major, each entry carrying its marginals so a
  * `posexplode` lands directly on the relational moment table.
  */
case class GramMoments(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")

  private val nTri = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + nTri

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("sum_i", LongType, nullable = false),
    StructField("sum_j", LongType, nullable = false),
    StructField("sum_ij", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_gram_moments requires ARRAY<BIGINT> (quantize first), got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"graft_gram_moments(dim=$dim) got a vector of length ${arr.numElements()}")
      val q = arr.toLongArray()
      b(0) += 1L
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) += q(i)
        val qi = q(i)
        var j = i
        while (j < dim) {
          b(t) += qi * q(j)
          t += 1
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val out = new Array[Any](nTri)
    val n = b(0)
    var i = 0
    var t = 1 + dim
    var r = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(r) = InternalRow(i, j, b(1 + i), b(1 + j), b(t), n)
        r += 1; t += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(b(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramMoments =
    copy(child = c.head)
  override def prettyName: String = "graft_gram_moments"
}

object GramMoments {
  /** `gramMoments(quantizedVec, dim)` — one aggregate value: the upper-
    * triangle moment structs `(i, j, Σqᵢ, Σqⱼ, Σqᵢqⱼ, n)`, ready to
    * `posexplode` into the relational moment table.
    */
  def gramMoments(c: Column, dim: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      GramMoments(org.apache.spark.sql.GraftBridge.expression(c), dim)
        .toAggregateExpression())
}
