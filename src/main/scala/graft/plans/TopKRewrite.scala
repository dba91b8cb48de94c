package graft.plans

import graft.functions.TopKPairs
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Optimizer rule: rewrite the classic window top-k-per-group pattern
  *
  * {{{
  *   SELECT g, s, id FROM (
  *     SELECT ..., row_number() OVER (PARTITION BY g ORDER BY s DESC, id) rn
  *   ) WHERE rn <= k
  * }}}
  *
  * into the bounded-heap `topk_pairs` aggregate + explode. The window
  * form must shuffle EVERY row of every group and sort each group
  * (O(n log n) per partition); the aggregate ships at most k pairs per
  * group per map task (O(n log k) map-side, k·|groups| through the
  * shuffle) — measured 2.5× faster at 8× bench scale (PLANS.md scale
  * probe), with the gap widening in the group size. This is the
  * "whole-operator" rung of the extension ladder: a logical-plan rewrite
  * Catalyst applies wherever the pattern occurs, injected via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`), toggled by
  * `spark.graft.topkRewrite.enabled` (default on).
  *
  * The rewrite fires only when it is PROVABLY answer-preserving:
  *
  *  - the window expression is exactly `row_number()` over
  *    `(s DESC, id ASC)` with `s: double NOT NULL` and
  *    `id: bigint NOT NULL` — matching `topk_pairs`' comparator, which
  *    orders scores under `java.lang.Double.compare`, the SAME total
  *    order SortOrder uses, so NaN scores rank first in both forms and
  *    the rewrite stays exact on any double input. Null scores would
  *    rank (NULLS LAST) under the window but are skipped by the heap,
  *    so nullable inputs are left alone.
  *  - neither s nor id is itself a partition key — restoring them under
  *    their original exprIds next to the pass-through group columns
  *    would otherwise emit two attributes with one exprId, breaking
  *    Catalyst's attribute-uniqueness invariant.
  *  - the filter is `rn <= lit` / `rn < lit` and nothing else.
  *  - the surviving output references ONLY the partition keys and
  *    (s, id). Then the kept rows are determined up to the top-k
  *    MULTISET of (s, id) values per group — even under score ties,
  *    where row_number's choice among duplicates is arbitrary, both
  *    forms project to the same multiset, so equality holds without any
  *    uniqueness assumption on the sort key.
  *
  * The replacement keeps the original attribute ids (the restored
  * (s, id) columns are re-aliased under the window child's exprIds), so
  * enclosing operators resolve untouched.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topkRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case p @ Project(out,
        Filter(cond, wnd @ Window(Seq(rnAlias @ Alias(
          WindowExpression(_: RowNumber, _), _)), part, order, child, _))) =>
        val rewritten = for {
          k <- limitFromCond(cond, rnAlias.toAttribute)
          (s, id) <- scoreIdFromOrder(order)
          groups <- attributeOnly(part)
          if !groups.exists(g => g.exprId == s.exprId || g.exprId == id.exprId)
          if outputIsRestorable(out, groups, s, id, rnAlias.toAttribute)
        } yield rebuild(out, groups, s, id, k, child)
        rewritten.getOrElse(p)
    }

  /** `rn <= k` / `rn < k` with a positive int literal, attr on the left. */
  private def limitFromCond(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k >= 1 => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
      case _ => None
    }

  /** `(s DESC, id ASC)` over non-null double / long attributes — the
    * exact comparator topk_pairs implements. */
  private def scoreIdFromOrder(order: Seq[SortOrder]): Option[(Attribute, Attribute)] =
    order match {
      case Seq(SortOrder(s: AttributeReference, Descending, _, _),
               SortOrder(id: AttributeReference, Ascending, _, _))
        if s.dataType == DoubleType && !s.nullable &&
           id.dataType == LongType && !id.nullable => Some((s, id))
      case _ => None
    }

  private def attributeOnly(part: Seq[Expression]): Option[Seq[Attribute]] = {
    val attrs = part.collect { case a: AttributeReference => a }
    if (attrs.length == part.length) Some(attrs) else None
  }

  /** Output may use only the group keys and (s, id) — and must not leak
    * rn, whose per-row value the aggregate form does not reproduce. */
  private def outputIsRestorable(out: Seq[NamedExpression], groups: Seq[Attribute],
                                 s: Attribute, id: Attribute, rn: Attribute): Boolean = {
    val allowed = AttributeSet(groups :+ s :+ id)
    out.forall(e => e.references.subsetOf(allowed) && !e.references.contains(rn))
  }

  private def rebuild(out: Seq[NamedExpression], groups: Seq[Attribute],
                      s: Attribute, id: Attribute, k: Int,
                      child: LogicalPlan): LogicalPlan = {
    val aggFn = TopKPairs(s, id, Literal(k))
    val pairsAlias = Alias(
      AggregateExpression(aggFn, Complete, isDistinct = false), "graft_topk_pairs")()
    val agg = Aggregate(groups, (groups :+ pairsAlias).map(_.asInstanceOf[NamedExpression]), child)
    val pairType = StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)))
    val pairAttr = AttributeReference("graft_pair", pairType, nullable = false)()
    val generate = Generate(Explode(pairsAlias.toAttribute),
      unrequiredChildIndex = Seq(groups.length), outer = false,
      qualifier = None, generatorOutput = Seq(pairAttr), child = agg)
    // restore (s, id) under their ORIGINAL exprIds so `out` resolves
    val restored = Project(
      groups.map(_.asInstanceOf[NamedExpression]) ++ Seq(
        Alias(GetStructField(pairAttr, 0, Some("score")), s.name)(exprId = s.exprId),
        Alias(GetStructField(pairAttr, 1, Some("id")), id.name)(exprId = id.exprId)),
      generate)
    Project(out, restored)
  }
}
