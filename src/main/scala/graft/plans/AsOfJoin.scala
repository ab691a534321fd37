package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension (the custom-operator ladder's step (c),
  * SURVEY.md §3.2): a NATIVE backward as-of join — for each left row,
  * the most recent right row of the same key with rightTs <= leftTs —
  * as a LogicalPlan + SparkStrategy + SparkPlan triple registered via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Spark has no as-of join operator (pandas `merge_asof` / DuckDB
  * `ASOF JOIN` territory); the composed form
  * ([[graft.operators.Joins.asOfBackward]], q22) unions both sides
  * through a running-max window. This operator instead merges the two
  * sorted streams partition-locally with a two-pointer scan:
  *
  *  - `requiredChildDistribution` = ClusteredDistribution(key) on BOTH
  *    children → EnsureRequirements co-partitions the sides (one hash
  *    Exchange each, exactly like a sort-merge join's);
  *  - `requiredChildOrdering` = (key, ts) ascending on both sides →
  *    Spark supplies the sorts, and fuses/elides them when upstream
  *    ordering already satisfies (e.g. a bucketed-sorted layout);
  *  - `doExecute` zips the co-partitioned streams: O(|L| + |R|) per
  *    partition, O(1) state (ONE buffered right row per key) — no
  *    union-row blowup, no window state, no spillable buffer at all.
  *
  * Keys and timestamps are LongType by contract (the public wrapper
  * [[graft.operators.Joins.asOfJoinNative]] casts). NULL key/ts rows
  * never match (DuckDB ASOF semantics): null left rows emit with a null
  * right side, null right rows are skipped — both arrive first in the
  * NULLS FIRST child sort, so the non-null tail stays monotonic for the
  * two-pointer scan. Not codegen'd (a leaf-ish exotic operator off the
  * hot agg/filter path; the scan/sort/exchange children still codegen).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * [[GraftExtensions]] (and `spark.experimental.extraStrategies` for
  * already-built sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order, so downstream keeps (key, ts)
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  // and they stay clustered by the left key: advertise it (like a
  // sort-merge join does) so a downstream groupBy/join on the key does
  // not pay a redundant Exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    // project through the NULLABLE output attrs (same exprIds): the
    // unmatched-left null row must get null checks in the generated
    // projection even where the right child declares non-nullable
    val outAttrs = output
    val lk = leftKey
    val rk = rightKey
    val lts = leftTs
    val rts = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition: projections are not thread-safe / serializable
      val lKeyTs = UnsafeProjection.create(Seq(lk, lts), leftOut)
      val rKeyTs = UnsafeProjection.create(Seq(rk, rts), rightOut)
      // bind against a schema whose right side is NULLABLE: BindReferences
      // takes nullability from the input schema, and the unmatched-left
      // null row needs null checks in the generated projection
      val joiner = UnsafeProjection.create(
        outAttrs.map(_.asInstanceOf[Expression]),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var matched: InternalRow = null
      var matchedKey = 0L
      lIter.map { lRow =>
        val kt = lKeyTs(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          // NULL key/ts never matches; these sort first, so emitting
          // without advancing rBuf keeps the non-null scan intact
          joiner(joined(lRow, nullRight))
        } else {
          val k = kt.getLong(0)
          val ts = kt.getLong(1)
          // advance rights up to (k, ts]; remember the LAST right per key
          var advance = true
          while (advance && rBuf.hasNext) {
            val rkt = rKeyTs(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rBuf.next() // NULL right rows never match anything
            } else {
              val rKey = rkt.getLong(0)
              val rTs = rkt.getLong(1)
              if (rKey < k || (rKey == k && rTs <= ts)) {
                if (rKey == k) {
                  // InternalRow.copy, not an UnsafeRow cast: with the
                  // sort elided (pre-sorted layout) the child may emit
                  // non-UnsafeRow rows
                  matched = rBuf.head.copy()
                  matchedKey = rKey
                }
                rBuf.next()
              } else advance = false
            }
          }
          val r = if (matched != null && matchedKey == k) matched else nullRight
          joiner(joined(lRow, r))
        }
      }
    }
  }
}
