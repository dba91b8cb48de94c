package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized-view query rewrite (R95): queries keep addressing the
  * BASE table; when a registered summary table can answer them, the
  * optimizer swaps the scan — the classic OLAP MV rewrite, the reason a
  * 100 TB fact table can serve dashboard aggregates from megabytes.
  *
  *   MV contents (built by [[graft.operators.MaterializedView.build]]):
  *     SELECT dims..., count(*) AS __cnt, sum(x) AS __sum_x ...
  *     FROM base GROUP BY dims
  *
  *   A query  `SELECT d, sum(x), count(*) FROM base [WHERE p(dims)]
  *   GROUP BY d`  with `d ⊆ dims` and `p` touching only dims becomes
  *     `SELECT d, sum(__sum_x), sum(__cnt) FROM mv [WHERE p] GROUP BY d`
  *
  * — valid because base-row multisets partition by the MV's dim tuple:
  * any coarser grouping re-aggregates whole cells, a dim-only predicate
  * keeps or drops whole cells, and sum/count are cell-decomposable.
  * Sum columns are INTEGRAL BY CONTRACT (enforced at build), so the
  * two-level sum is bit-exact — a double sum would reassociate.
  * Count(*) maps to sum(__cnt), never null since an MV cell implies
  * ≥1 base row.
  *
  * The rewrite fires only when PROVABLY answer-preserving; anything
  * else (non-dim grouping or predicate, min/max/avg, expressions over
  * aggregates it cannot decompose) is left untouched. Freshness is the
  * registrar's contract (pair with TableLog versions for a stale-read
  * guard); [[MvCatalog.clear]] deregisters. Output attribute exprIds
  * are preserved, so enclosing operators resolve unchanged. Toggle:
  * `spark.graft.mvRewrite.enabled` (default on).
  */
object MvCatalog {
  final case class MvDef(basePath: String, mvPath: String,
                         dims: Seq[String], sums: Seq[String])

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def register(d: MvDef): Unit = { reg.put(norm(d.basePath), d); () }
  def clear(): Unit = reg.clear()
  def isEmpty: Boolean = reg.isEmpty
  def lookup(paths: Seq[String]): Option[MvDef] =
    if (paths.length != 1) None else Option(reg.get(norm(paths.head)))
}

object RewriteToMv extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mvRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty || !conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(ge, ae, child, _) =>
        attemptRewrite(ge, ae, child).getOrElse(agg)
    }

  /** Peel pruning Projects (plain attributes only) and collect Filter
    * conditions down to a parquet LogicalRelation. */
  private def unwrap(plan: LogicalPlan,
                     conds: Seq[Expression]): Option[(Seq[String], Seq[Expression])] =
    plan match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c, conds)
      case Filter(cond, c) => unwrap(c, conds :+ cond)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((fs.location.rootPaths.map(_.toString), conds))
      case _ => None
    }

  private def attemptRewrite(ge: Seq[Expression], ae: Seq[NamedExpression],
                             child: LogicalPlan): Option[LogicalPlan] = {
    // GROUPED queries only: a global aggregate over an EMPTY base emits
    // one row (count(*) = 0) while the empty MV's sum emits NULL — the
    // one spot where the cell-decomposition argument breaks
    if (ge.isEmpty) return None
    val (paths, conds) = unwrap(child, Seq.empty).getOrElse(return None)
    val mv = MvCatalog.lookup(paths).getOrElse(return None)
    val dimSet = mv.dims.toSet
    // grouping: plain base attributes, all of them MV dims
    val geAttrs = ge.map {
      case a: AttributeReference if dimSet.contains(a.name) => a
      case _ => return None
    }
    // predicates: every referenced column must be an MV dim
    if (conds.exists(_.references.exists(r => !dimSet.contains(r.name))))
      return None
    // fresh scan of the summary table (analysis only — no re-optimization)
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath)
      .queryExecution.analyzed
    def mvAttrOpt(name: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    def mvAttr(name: String): AttributeReference =
      mvAttrOpt(name).getOrElse(
        throw new IllegalStateException(s"mv missing column $name"))
    // the eval context rides through: try_sum/ANSI overflow semantics
    // must survive the swap (legacy wraps where TRY nulls, ANSI throws)
    def sumOf(name: String,
              ctx: Option[NumericEvalContext] = None): Expression =
      AggregateExpression(
        ctx.map(Sum(mvAttr(name), _)).getOrElse(Sum(mvAttr(name))),
        Complete, isDistinct = false)
    // output list: grouping dims pass through; sum(x) → sum(__sum_x);
    // count(*) → sum(__cnt); anything else aborts. exprIds preserved.
    // NOTE the explicit `None` in the filter slot: an aggregate with a
    // FILTER (WHERE ...) clause keeps or drops individual BASE rows —
    // matching it with a wildcard would rewrite `sum(x) FILTER (...)`
    // to a plain sum of cell partials, silently dropping the filter.
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if dimSet.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(Sum(se, mode), _, false, None, _), n) =>
        val base = se match {
          case ar: AttributeReference => ar
          case Cast(ar: AttributeReference, LongType, _, _) => ar
          case _ => return None
        }
        if (!mv.sums.contains(base.name)) return None
        Alias(sumOf(s"__sum_${base.name}", Some(mode)), n)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(Count(Seq(Literal(_, IntegerType))), _, false, None, _), n) =>
        Alias(sumOf("__cnt"), n)(exprId = al.exprId)
      case _ => return None
    }
    val baseToMv = AttributeMap(
      (geAttrs.map(a => a -> mvAttr(a.name)) ++
        conds.flatMap(_.references.map(r =>
          r.asInstanceOf[AttributeReference] -> mvAttr(r.name)))).toSeq)
    val filtered = conds
      .map(_.transform { case a: AttributeReference => baseToMv(a) })
      .reduceOption(And)
      .map(Filter(_, mvPlan)).getOrElse(mvPlan)
    Some(Aggregate(geAttrs.map(baseToMv(_)), newAe, filtered, None))
  }
}
