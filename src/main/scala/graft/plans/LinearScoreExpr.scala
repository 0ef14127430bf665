package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native form of
  * [[graft.functions.TextAnalysis.linearScore]] — the hashed
  * linear-classifier margin `(Σ w(token)) / n_tokens` with md5-bucket
  * weights. The HOF twin interprets its lambda per token and round-trips
  * every hash through a hex STRING (`md5 → substring → conv`); this
  * expression walks the UTF8 bytes once, digests each token directly,
  * and reads the bucket from the first four digest bytes — no hex, no
  * per-token Column-tree evaluation, and the surrounding projection
  * stays in whole-stage codegen (the codegen body is one static call).
  * Bit-equality with the HOF form is spec-pinned, including the
  * empty-token corners Spark's `split` produces around non-space
  * whitespace at the string edges.
  */
case class LinearScoreF(child: Expression, nBuckets: Int)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_linear_score requires STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    LinearScoreF.score(v.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LinearScoreF.score($c, $nBuckets)")

  override protected def withNewChildInternal(newChild: Expression): LinearScoreF =
    copy(child = newChild)
  override def prettyName: String = "graft_linear_score"
}

object LinearScoreF {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Java-regex \s — the whitespace class the HOF form's regexp_replace
  // collapses. All ASCII, so byte-level segmentation of UTF-8 is safe.
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def bucketWeight(md: java.security.MessageDigest, bytes: Array[Byte],
                           from: Int, until: Int, nBuckets: Int): Long = {
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    // first 8 hex chars == first 4 bytes as an unsigned 32-bit value
    val u = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    u % nBuckets - nBuckets / 2
  }

  /** Static bridge the generated code calls. Token semantics mirror the
    * HOF pipeline `split(regexp_replace(lower(trim(s)), "\\s+", " "), " ")`
    * exactly: segments between whitespace RUNS, plus one empty token for
    * a leading run and one for a trailing run (space-only trim leaves
    * e.g. tab-led strings with collapse artifacts, and Spark's split
    * keeps edge empties). Blank-after-trim input is the caller's guard.
    */
  def score(s: UTF8String, nBuckets: Int): Double = {
    val b = s.trim().toLowerCase.getBytes
    val md = digests.get()
    var sum = 0L
    var count = 0L
    var i = 0
    val n = b.length
    if (n == 0) {
      // split("", " ") is a single empty token
      sum = bucketWeight(md, b, 0, 0, nBuckets); count = 1L
    } else {
      if (isWs(b(0))) { sum += bucketWeight(md, b, 0, 0, nBuckets); count += 1 }
      while (i < n) {
        if (isWs(b(i))) i += 1
        else {
          val start = i
          while (i < n && !isWs(b(i))) i += 1
          sum += bucketWeight(md, b, start, i, nBuckets)
          count += 1
        }
      }
      if (isWs(b(n - 1))) { sum += bucketWeight(md, b, 0, 0, nBuckets); count += 1 }
    }
    sum.toDouble / count.toDouble
  }

  def linearScore(c: Column, nBuckets: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      LinearScoreF(org.apache.spark.sql.GraftBridge.expression(c), nBuckets))
}
