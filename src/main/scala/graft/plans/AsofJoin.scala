package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a whole-operator extension — the full custom-plan
  * path (logical node → planner Strategy → physical exec) registered
  * through SparkSessionExtensions, for semantics the built-in
  * operators can't express as ONE operator: pair every left row with
  * the LATEST right row of the same key whose time is <= the left
  * row's time (left outer).
  *
  * The library also ships a composed form (operators/Relational
  * .asofJoinLatest: union + running-last window) with identical
  * semantics — q35's oracle checks that one, q85's checks this one,
  * and AsofNativeSpec proves them row-identical on randomized inputs.
  *
  * Why a custom exec earns its keep at 100 TB:
  *  - the composed form UNIONS both inputs and runs a window over the
  *    union — every right VALUE column travels through the union
  *    schema, and the window materializes a running-last struct per
  *    row. The exec shuffles each side once by key, sorts by
  *    (key, time) — the same exchanges a SortMergeJoin would need —
  *    then streams BOTH sorted iterators through a per-partition
  *    MERGE holding exactly ONE buffered right row and ONE latest
  *    match: O(1) state, no union schema, no window buffer.
  *  - EnsureRequirements plans the exchanges/sorts (the exec only
  *    declares ClusteredDistribution + (key, time) ordering), so AQE,
  *    reuse, and bucketed inputs (which already satisfy the
  *    distribution — zero-exchange as-of) all compose for free.
  *
  * Null semantics (spec'd): callers drop null right keys/times up
  * front (the wrapper does) — sort-order placement would otherwise
  * leak null-time rows ahead of real ones, mirroring the composed
  * form's explicit na.drop.
  *
  * Tie contract: among right rows with IDENTICAL (key, time) the
  * "latest" is whichever the (unstable) sort emits last — the same
  * nondeterminism the composed window form and DuckDB ASOF have.
  * Callers needing determinism under exact ties must pre-dedup the
  * right side on (key, time) (e.g. min_by/max_by a tiebreaker).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]. Injected via
  * SparkSessionExtensions (GraftExtensions) or
  * `spark.experimental.extraStrategies`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sorted per-partition merge: both children hash-clustered on the
  * keys and sorted by (keys, time); for each left row the merge
  * advances the right iterator past every row with
  * (key < leftKey) or (key == leftKey && time <= leftTime), keeping
  * the LAST advanced row of the current key as the match. O(1) state
  * per partition; each input row is visited once.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time types must match")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      // one-row lookahead of the right side (copied: sort iterators
      // reuse their row objects) + the latest match for the current key
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      var lastMatch: InternalRow = null
      var curKey: InternalRow = null // stable copy of the left key group

      lIter.map { l =>
        val lKey = lKeyProj(l)
        if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
          curKey = lKey.copy()
          lastMatch = null
        }
        val lTime = lTimeProj(l)
        var advance = true
        while (advance) {
          if (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            rHead = r.copy()
            rHeadKey = rKeyProj(rHead).copy()
          }
          if (rHead == null) advance = false
          else {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) {
              rHead = null // right key already behind every future left row
            } else if (c == 0 &&
              timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
              lastMatch = rHead // latest-so-far for this key
              rHead = null
            } else {
              advance = false // right is ahead; stop
            }
          }
        }
        joined(l, if (lastMatch != null) lastMatch else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
