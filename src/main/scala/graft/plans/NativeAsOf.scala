package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the Catalyst extension path (c): a
  * custom logical node, a planner [[SparkStrategy]], and a physical
  * operator with declared distribution/ordering requirements, injected
  * via `SparkSessionExtensions` (see [[GraftExtensions]]).
  *
  * Semantics match [[graft.ops.AsOfJoin.asofLeft]] (the reference's
  * tx->outcome point-in-time matching, borealis-indexer/src/main.rs:121-124):
  * every left row joins the latest right row with `right.ts <= left.ts`
  * for the same key, or nulls when none exists.
  *
  * Why a physical operator when the union+window encoding already
  * works: the window formulation materializes left+right into ONE
  * sorted partition stream and runs a running-`last` frame over the
  * union — it cannot prune right payload rows early and carries the
  * `__side`/null-marker columns through the shuffle. This operator
  * declares `ClusteredDistribution` on each side's key and a
  * `(key, ts)` sort per child, so Catalyst plans the same
  * shuffle+sort cost as a sort-merge join, and the merge itself is a
  * single forward pass per partition holding exactly ONE buffered
  * right row — no union blow-up, no marker columns, null payloads
  * join exactly (no forward-fill contract needed).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children are hash-clustered on their keys
  * (co-partitioned by EnsureRequirements, same as a shuffled join) and
  * sorted by (key, ts) within partitions; the merge is one streaming
  * pass per partition with O(1) state: the latest right row at-or-before
  * the left cursor. Scale shape: one shuffle per side + sort — identical
  * to SMJ; no row explosion on dense right sides (the naive
  * `ON key AND r.ts <= l.ts` inequality join is O(|l| x |matches|)).
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payload = rightPayload
    val keyType = lKeyExpr.dataType
    val tsType = lTsExpr.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd comparators/projections are not serializable — build
      // them per partition from the (serializable) expressions/types
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      val nullPayload = new GenericInternalRow(payload.size)
      val joined = new JoinedRow
      // downstream exchanges serialize UnsafeRows — flatten the JoinedRow
      val resultProj = UnsafeProjection.create(
        (lOut ++ payload).zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(i, a.dataType, nullable = true)
        })

      new Iterator[InternalRow] {
        // the one buffered candidate: latest right row seen whose
        // (key, ts) is <= the left cursor, with its key for the
        // emit-time equality check
        private var matchKey: InternalRow = _
        private var matchPayload: InternalRow = _
        // right cursor: key/ts copies of the not-yet-consumed right row
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        private var rPay: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rKey = rKeyProj(r).copy()
            rTs = rTsProj(r).copy()
            rPay = payloadProj(r).copy()
          } else { rKey = null; rTs = null; rPay = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          // consume right rows at-or-before the left cursor; null keys
          // sort first and never match (SQL join semantics)
          var advancing = rKey != null
          while (advancing) {
            val c = keyOrdering.compare(rKey, lk)
            if (c < 0 || (c == 0 && tsOrdering.compare(rTs, lt) <= 0)) {
              if (c == 0 && !rKey.isNullAt(0) && !rTs.isNullAt(0)) {
                matchKey = rKey
                matchPayload = rPay
              }
              advanceRight()
              advancing = rKey != null
            } else advancing = false
          }
          val hit = matchKey != null && !lk.isNullAt(0) &&
            keyOrdering.compare(matchKey, lk) == 0
          numOutputRows += 1
          if (hit) numMatched += 1
          resultProj(joined(l, if (hit) matchPayload else nullPayload))
        }
      }
    }
  }
}
