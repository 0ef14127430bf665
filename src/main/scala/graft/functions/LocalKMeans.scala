package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local Lloyd's k-means over a bounded, content-sampled fit set —
  * the quantizer-training path shared by [[IvfIndex]] (coarse lists) and
  * [[PqIndex]] (subspace codebooks).
  *
  * Quantizer training is sample-based BY DESIGN at any corpus scale
  * (FAISS trains coarse/PQ quantizers on 10⁴–10⁶ sampled vectors
  * regardless of index size): the fit input is capped, so collecting it
  * is O(cap·dim) — the same "tiny metadata collect" class as IVF's
  * nLists-row centroid table, never data-sized. Running Lloyd locally
  * removes the per-iteration Spark job barrier: the previous MLlib path
  * scheduled (m fits × iters) near-empty jobs whose actual arithmetic is
  * sub-millisecond — at bench scale that was seconds of pure scheduling,
  * and at 100 TB it is the same constant, because the sample is.
  *
  * Determinism: the sample is selected by a CONTENT hash threshold (no
  * partition-layout dependence), and the seeded k-means++ init + Lloyd
  * iterations are plain sequential code — identical output for identical
  * input rows, however the corpus is laid out.
  */
object LocalKMeans {

  /** Deterministic, layout-independent sample of `vecCol` as double
    * arrays: rows kept by a content-hash threshold sized to ≈`cap` rows
    * in expectation (all rows when the table already fits).
    */
  def sampleVectors(df: DataFrame, vecCol: String, cap: Int,
                    seed: Long): Array[Array[Double]] = {
    val n = df.count()
    val src =
      if (n <= cap) df
      else {
        val buckets = 1L << 20
        val keep = math.max(1L, buckets * cap / n)
        df.where(pmod(xxhash64(col(vecCol).cast("array<double>"), lit(seed)),
          lit(buckets)) < keep)
      }
    val rows = src.select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    // collect() returns rows in partition order — sort the (bounded)
    // sample by content so the seeded k-means++ init sees the same
    // sequence however the corpus is laid out
    java.util.Arrays.sort(rows, new java.util.Comparator[Array[Double]] {
      def compare(a: Array[Double], b: Array[Double]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = java.lang.Double.compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        java.lang.Integer.compare(a.length, b.length)
      }
    })
    rows
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Seeded k-means++ init + Lloyd iterations. Empty clusters reseed to a
    * random fit point (deterministic under the seed). Converges early
    * when no assignment moves.
    */
  def fit(points: Array[Array[Double]], k: Int, iters: Int,
          seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means fit set is empty")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    val centers = Array.ofDim[Double](k, dim)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    // k-means++: sample each next center ∝ squared distance to nearest
    val d2 = Array.fill(points.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < points.length) {
        val d = sqDist(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val total = d2.sum
      if (total <= 0) centers(c) = points(rnd.nextInt(points.length)).clone()
      else {
        var r = rnd.nextDouble() * total; var j = 0
        while (j < points.length - 1 && r > d2(j)) { r -= d2(j); j += 1 }
        centers(c) = points(j).clone()
      }
      c += 1
    }
    val assign = Array.fill(points.length)(-1)
    var it = 0
    var moved = true
    while (it < iters && moved) {
      moved = false
      var i = 0
      while (i < points.length) {
        var best = 0; var bd = Double.MaxValue; var cc = 0
        while (cc < k) {
          val d = sqDist(points(i), centers(cc))
          if (d < bd) { bd = d; best = cc }
          cc += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.ofDim[Double](k, dim)
      val cnt = new Array[Int](k)
      i = 0
      while (i < points.length) {
        val a = assign(i); cnt(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += points(i)(d); d += 1 }
        i += 1
      }
      var cc = 0
      while (cc < k) {
        if (cnt(cc) > 0) {
          var d = 0
          while (d < dim) { centers(cc)(d) = sums(cc)(d) / cnt(cc); d += 1 }
        } else centers(cc) = points(rnd.nextInt(points.length)).clone()
        cc += 1
      }
      it += 1
    }
    centers
  }
}
