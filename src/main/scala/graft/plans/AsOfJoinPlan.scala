package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the (c)-level custom-operator path from the
  * design rules: a LogicalPlan node, a planner Strategy, and a SparkPlan
  * whose execution is a single co-partitioned sorted merge.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], asserted in
  * AsOfJoinSpec): for every LEFT row, attach the LAST right row of the
  * same key with rightTs ≤ leftTs, or nulls if none precedes it.
  *
  * Why a custom operator here: the window-composition form must sort the
  * UNION of both sides inside one window per key; this operator instead
  * asks EnsureRequirements for co-partitioned inputs each sorted by
  * (key, ts) — so each side is sorted separately (smaller sorts, and a
  * side already bucketed+sorted by (key, ts) needs no sort or shuffle at
  * all), then streams both iterators through an O(|L|+|R|) merge with
  * O(1) state per partition. Same shuffle count in the worst case, but
  * the sort is split and the carry-forward state is one remembered row
  * instead of a window frame.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  // right columns become nullable: unmatched left rows carry nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ... and sort each side by (key, ts) — EnsureRequirements inserts
  // exchanges/sorts only where the child does not already satisfy this
  // (a bucketed+sorted table satisfies it for free)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lts = leftTs
    val rts = rightTs
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      // bind with the right side forced nullable: unmatched left rows feed
      // a null-valued row, and a non-nullable binding would skip the null
      // check and read primitive zeros instead of nulls
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.size)

      val buffered = rIter.buffered
      // carry-forward state: the latest right row seen for `matchKey`
      var matchKey: Any = null
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val lKeyVal = lKeyProj(lRow).get(0, lk.dataType)
        val lTsVal = lTsProj(lRow).get(0, lts.dataType)
        // advance the right side through every row at-or-before this left
        // row in (key, ts) order, remembering the last same-key row
        var advancing = true
        while (advancing && buffered.hasNext) {
          val rRow = buffered.head
          val rKeyVal = rKeyProj(rRow).get(0, rk.dataType)
          val kc = keyOrd.compare(rKeyVal.asInstanceOf[AnyRef],
            lKeyVal.asInstanceOf[AnyRef])
          if (kc < 0) {
            buffered.next() // right key behind the left key: skip
          } else if (kc == 0) {
            val rTsVal = rTsProj(rRow).get(0, rts.dataType)
            if (tsOrd.compare(rTsVal.asInstanceOf[AnyRef],
                lTsVal.asInstanceOf[AnyRef]) <= 0) {
              matchRow = buffered.next().copy()
              // copy: projection buffers are reused across rows, and this
              // value must survive iterations (UTF8String/Decimal keys)
              matchKey = InternalRow.copyValue(lKeyVal)
              hasMatch = true
            } else advancing = false // same key, future ts
          } else advancing = false // right key ahead
        }
        val matches = hasMatch &&
          keyOrd.compare(matchKey.asInstanceOf[AnyRef],
            lKeyVal.asInstanceOf[AnyRef]) == 0
        resultProj(joined(lRow, if (matches) matchRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** As-of join via the custom operator: `left` rows gain every `right`
    * column (nullable), valued from the last right row of the matching key
    * at or before the left row's time. Installs [[AsOfJoinStrategy]] on
    * the session (idempotent). Null keys/timestamps must be filtered
    * upstream (as with any merge join).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val spark: SparkSession = left.sparkSession
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftBridge.logicalPlan(left)
    val rPlan = GraftBridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    // the merge compares key/time values with ONE ordering per pair — a
    // type mismatch (bigint vs int key) would ClassCastException on
    // executors mid-job; fail fast at the driver instead
    require(lk.dataType == rk.dataType,
      s"as-of key type mismatch: $leftKey is ${lk.dataType.sql}, " +
        s"$rightKey is ${rk.dataType.sql} — cast one side first")
    require(lt.dataType == rt.dataType,
      s"as-of time type mismatch: $leftTime is ${lt.dataType.sql}, " +
        s"$rightTime is ${rt.dataType.sql} — cast one side first")
    GraftBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt))
  }
}
