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
  * Semantics: for every LEFT row, attach one right row of the same key —
  * `backward`: the LAST right row with rightTs ≤ leftTs (identical to
  * [[graft.operators.AsOfJoin.asOf]], asserted in AsOfJoinSpec);
  * `forward`: the FIRST right row with rightTs ≥ leftTs;
  * `nearest`: whichever of those two is closer in time (ties → backward).
  * Among right rows sharing one timestamp, backward keeps the run's last
  * row (the carry) while forward/nearest keep its first — each direction
  * honors its own FIRST/LAST wording, pinned by AsOfJoinSpec on payloads
  * (a ts-only oracle cannot tell equal-ts duplicates apart).
  * An optional `tolerance` (native ts units: microseconds for timestamps,
  * days for dates) drops matches further than that from the left row.
  * Null keys/timestamps never match (left rows keep their row with a null
  * right side; right rows are skipped) — enforced in the merge, not just
  * documented.
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
                        leftTs: Expression, rightTs: Expression,
                        direction: String = "backward",
                        tolerance: Option[Long] = None)
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
    case AsOfJoinNode(l, r, lk, rk, lts, rts, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        direction: String = "backward",
                        tolerance: Option[Long] = None)
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

  /** Internal ts representation as a Long in the type's native unit
    * (micros for TimestampType, days for DateType, the value itself for
    * integral types) — the unit `tolerance` is expressed in and the
    * quantity `nearest` minimizes.
    */
  private def tsLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case n: java.lang.Number => n.longValue()
    case other => throw new UnsupportedOperationException(
      s"as-of tolerance/nearest unsupported for ts value class ${other.getClass}")
  }

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
    val dir = direction
    val tol = tolerance

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
      // carry-forward state: the latest backward-eligible right row for
      // `matchKey`, plus its ts (for tolerance/nearest distance)
      var matchKey: Any = null
      var hasMatch = false
      var matchRow: InternalRow = null
      var matchTs: Any = null

      def withinTol(laterTs: Any, earlierTs: Any): Boolean = tol match {
        case Some(t) => tsLong(laterTs) - tsLong(earlierTs) <= t
        case None => true
      }

      lIter.map { lRow =>
        val lKeyRow = lKeyProj(lRow)
        val lTsRow = lTsProj(lRow)
        if (lKeyRow.isNullAt(0) || lTsRow.isNullAt(0)) {
          // a null key/ts joins nothing, but the left row survives
          resultProj(joined(lRow, nullRight))
        } else {
          val lKeyVal = InternalRow.copyValue(lKeyRow.get(0, lk.dataType))
          val lTsVal = InternalRow.copyValue(lTsRow.get(0, lts.dataType))
          // advance the right side through every row at-or-before this left
          // row in (key, ts) order, remembering the last same-key row;
          // right rows with null key/ts sort first and are skipped here
          var advancing = true
          while (advancing && buffered.hasNext) {
            val rRow = buffered.head
            val rKeyRow = rKeyProj(rRow)
            if (rKeyRow.isNullAt(0)) buffered.next()
            else {
              val kc = keyOrd.compare(
                rKeyRow.get(0, rk.dataType).asInstanceOf[AnyRef],
                lKeyVal.asInstanceOf[AnyRef])
              if (kc < 0) {
                buffered.next() // right key behind the left key: skip
              } else if (kc == 0) {
                val rTsRow = rTsProj(rRow)
                if (rTsRow.isNullAt(0)) buffered.next() // null ts never matches
                else {
                  val rTsVal = rTsRow.get(0, rts.dataType)
                  val tc = tsOrd.compare(rTsVal.asInstanceOf[AnyRef],
                    lTsVal.asInstanceOf[AnyRef])
                  // forward/nearest return the FIRST right row with
                  // ts >= lts (as documented), so once an equal-ts match
                  // is held, further equal-ts duplicates must not
                  // overwrite it — stop and leave them for later left
                  // rows. Backward keeps last-of-equal-ts (the carry).
                  val holdFirstEqual = dir != "backward" && tc == 0 &&
                    hasMatch && keyOrd.compare(matchKey.asInstanceOf[AnyRef],
                      lKeyVal.asInstanceOf[AnyRef]) == 0 &&
                    tsOrd.compare(matchTs.asInstanceOf[AnyRef],
                      lTsVal.asInstanceOf[AnyRef]) == 0
                  if (tc <= 0 && !holdFirstEqual) {
                    matchRow = buffered.next().copy()
                    // copy: projection buffers are reused across rows, and
                    // these values must survive iterations
                    matchTs = InternalRow.copyValue(rTsVal)
                    matchKey = lKeyVal
                    hasMatch = true
                  } else advancing = false // future ts, or first-equal held
                }
              } else advancing = false // right key ahead
            }
          }
          val backOk = hasMatch &&
            keyOrd.compare(matchKey.asInstanceOf[AnyRef],
              lKeyVal.asInstanceOf[AnyRef]) == 0 &&
            withinTol(lTsVal, matchTs)
          // forward candidate: the (unconsumed) head, iff same key — the
          // first right row with ts > lts, shared by later left rows too
          def forwardCandidate: Option[(InternalRow, Any)] =
            if (!buffered.hasNext) None
            else {
              val rRow = buffered.head
              val rKeyRow = rKeyProj(rRow)
              if (rKeyRow.isNullAt(0) ||
                  keyOrd.compare(rKeyRow.get(0, rk.dataType).asInstanceOf[AnyRef],
                    lKeyVal.asInstanceOf[AnyRef]) != 0) None
              else {
                val rTsRow = rTsProj(rRow)
                if (rTsRow.isNullAt(0)) None
                else Some((rRow, rTsRow.get(0, rts.dataType)))
              }
            }
          val chosen: InternalRow = dir match {
            case "backward" => if (backOk) matchRow else nullRight
            case "forward" =>
              // a backward match at EXACTLY lts is also the forward match
              // (ts ≥ lts) — and was already consumed by the advance
              if (backOk && tsOrd.compare(matchTs.asInstanceOf[AnyRef],
                  lTsVal.asInstanceOf[AnyRef]) == 0) matchRow
              else forwardCandidate match {
                case Some((r, fts)) if withinTol(fts, lTsVal) => r
                case _ => nullRight
              }
            case "nearest" =>
              val fwd = forwardCandidate.filter { case (_, fts) => withinTol(fts, lTsVal) }
              (backOk, fwd) match {
                case (true, Some((r, fts))) =>
                  val backDist = tsLong(lTsVal) - tsLong(matchTs)
                  val fwdDist = tsLong(fts) - tsLong(lTsVal)
                  if (backDist <= fwdDist) matchRow else r // tie → backward
                case (true, None) => matchRow
                case (false, Some((r, _))) => r
                case _ => nullRight
              }
          }
          resultProj(joined(lRow, chosen))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  val Directions = Set("backward", "forward", "nearest")

  /** As-of join via the custom operator: `left` rows gain every `right`
    * column (nullable), valued from the right row of the matching key
    * selected by `direction` (see [[AsOfJoinNode]]); `tolerance` (native
    * ts units — micros for timestamps, days for dates) bounds the match
    * distance. Null keys/timestamps are handled inside the merge: such
    * left rows emit with a null right side, such right rows never match.
    * Installs [[AsOfJoinStrategy]] on the session (idempotent).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    require(Directions.contains(direction),
      s"as-of direction must be one of $Directions, got '$direction'")
    require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
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
    GraftBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, direction, tolerance))
  }
}
