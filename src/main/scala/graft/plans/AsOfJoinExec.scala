package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{BooleanType, DataType}

/** The whole-operator rung of the extension ladder, physical edition
  * (SURVEY.md §2 design rule (c)): a first-class AS-OF JOIN planned as
  * its own `SparkPlan` instead of the union–window composition in
  * [[graft.operators.AsOfJoin.asof]].
  *
  * The composition costs one shuffle of LEFT+RIGHT combined plus a
  * per-key window over the union; this exec costs one shuffle of EACH
  * side (same bytes moved) and then a single forward MERGE pass per
  * partition — no window state, no null-padded union columns, and the
  * carry variable is one buffered right row. Semantics are QuestDB/pandas
  * `merge_asof` backward-inclusive: each left row gets the latest right
  * row with the same key and `rightTime <= leftTime`, or nulls (left
  * outer). Right rows should be unique per (key, time) — same contract
  * as DuckDB's ASOF JOIN, which otherwise picks an arbitrary winner.
  *
  * Wiring: [[AsOfMatch]] is an unevaluable marker predicate registered
  * as the SQL function `asof_match(lk, rk, lt, rt)`; users write a plain
  * `left.join(right, asof_match(...), "left")` and [[AsOfJoinStrategy]]
  * (injected via `SparkSessionExtensions.injectPlannerStrategy`) plans
  * the join as [[AsOfJoinExec]]. If the strategy is not installed the
  * marker fails loudly at execution (Unevaluable), never silently wrong.
  */
case class AsOfMatch(leftKey: Expression, rightKey: Expression,
                     leftTime: Expression, rightTime: Expression)
  extends Expression with Unevaluable {

  override def children: Seq[Expression] = Seq(leftKey, rightKey, leftTime, rightTime)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!org.apache.spark.sql.types.DataType.equalsStructurally(
        leftKey.dataType, rightKey.dataType, ignoreNullability = true)) {
      TypeCheckResult.TypeCheckFailure(
        s"asof_match keys differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    } else if (!org.apache.spark.sql.types.DataType.equalsStructurally(
        leftTime.dataType, rightTime.dataType, ignoreNullability = true)) {
      TypeCheckResult.TypeCheckFailure(
        s"asof_match times differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    } else if (!TypeUtils.typeWithProperEquals(leftKey.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"asof_match key type not joinable: ${leftKey.dataType}")
    } else {
      TypeUtils.checkForOrderingExpr(leftTime.dataType, "asof_match time")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(leftKey = newChildren(0), rightKey = newChildren(1),
      leftTime = newChildren(2), rightTime = newChildren(3))
}

/** Plans `Join(l, r, LeftOuter, asof_match(...))` as [[AsOfJoinExec]].
  * Injected strategies run before the built-ins, so JoinSelection never
  * sees the marker join.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, LeftOuter, Some(m: AsOfMatch), _) =>
      AsOfJoinExec(m.leftKey, m.rightKey, m.leftTime, m.rightTime,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Partitioned sort-merge as-of join.
  *
  * Scale shape: `requiredChildDistribution` hash-co-partitions both
  * sides on the key (EnsureRequirements inserts the exchanges, AQE can
  * still coalesce them) and `requiredChildOrdering` asks for (key, time)
  * ascending per partition — at 100 TB that is exactly a sort-merge
  * join's cost envelope, and already-bucketed/sorted inputs skip the
  * exchange and sort entirely, which the union–window composition can
  * never do (its window input is the union, bucketed for neither side).
  * The merge itself is a forward-only single pass: left rows stream in
  * (key, time) order while one candidate right row (the latest with
  * `rightTime <= leftTime`) is carried per key; null keys or times never
  * match (SQL comparison semantics) but left rows always survive.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val allOutput = output
    val numOutputRows = longMetric("numOutputRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated on the executor, per partition — projections and
      // generated orderings are not serializable
      val lProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val keyTimeOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, keyDt, nullable = true), Ascending),
        SortOrder(BoundReference(1, timeDt, nullable = true), Ascending)))
      val keyOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, keyDt, nullable = true), Ascending)))
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow

      var rHead: InternalRow = null   // un-consumed right row (buffer-backed)
      var rHeadKeys: InternalRow = null
      var cand: InternalRow = null    // copied latest at-or-before right row
      var candKeys: InternalRow = null

      lIter.map { lRow =>
        val lKeys = lProj(lRow)
        var rightMatch: InternalRow = nullRight
        if (!lKeys.isNullAt(0) && !lKeys.isNullAt(1)) {
          // consume every right row sorting at-or-before (key, time);
          // nulls-first ordering means null-key/null-time right rows are
          // consumed (and skipped as candidates) before any real match
          var done = false
          while (!done) {
            if (rHead == null && rIter.hasNext) {
              rHead = rIter.next()
              rHeadKeys = rProj(rHead)
            }
            if (rHead == null) done = true
            else if (keyTimeOrd.compare(rHeadKeys, lKeys) <= 0) {
              if (!rHeadKeys.isNullAt(0) && !rHeadKeys.isNullAt(1) &&
                  keyOrd.compare(rHeadKeys, lKeys) == 0) {
                cand = rHead.copy()
                candKeys = rHeadKeys.copy()
              }
              rHead = null // consumed
            } else done = true
          }
          if (cand != null && keyOrd.compare(candKeys, lKeys) == 0) {
            rightMatch = cand
          }
        }
        numOutputRows += 1
        resultProj(joined(lRow, rightMatch))
      }
    }
  }
}
