package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.GraftColumnAccess
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.TableLog

/** SQL `UPDATE graftsql.ns.t SET c = e, … WHERE p` over the versioned
  * table log (VERDICT r5 item 8) — the warehouse-surface gap left by
  * [[GraftLogTable]]'s documented non-wiring of
  * `SupportsRowLevelOperations` (the group-based rewrite framework
  * demands a native V2 Batch scan, which the V1Scan bridge deliberately
  * does not provide). Instead of re-implementing parquet IO inside a
  * connector scan, the statement is intercepted at ANALYSIS: an injected
  * resolution rule matches the resolved [[UpdateTable]] plan over a
  * GraftLogTable relation and replaces it with a runnable command that
  * executes [[TableLog.update]] — one atomic copy-on-write manifest
  * commit with the OCC race semantics of the native API. DELETE keeps
  * its `SupportsDelete` fast path (this rule matches UPDATE only).
  *
  * Loud-refusal contract (the DELETE one, extended): assignments must
  * target top-level columns (no nested-field surgery), and neither the
  * WHERE predicate nor any SET value may contain a subquery or a
  * non-deterministic expression — each refusal names the offending
  * expression rather than updating the wrong rows.
  */
object ResolveGraftUpdate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(_, assignments, condition) if u.resolved &&
        graftTableOf(u.table).isDefined =>
      val table = graftTableOf(u.table).get
      val assigns = assignments.map(checkAssignment)
      condition.foreach(check("UPDATE WHERE clause", _))
      UpdateGraftTableCommand(table.tableDir, assigns, condition)
  }

  private def graftTableOf(plan: LogicalPlan): Option[GraftLogTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLogTable] =>
        r.table.asInstanceOf[GraftLogTable]
    }

  private def checkAssignment(a: Assignment): (String, Expression) = a.key match {
    case attr: AttributeReference =>
      check(s"SET value for ${attr.name}", a.value)
      attr.name -> a.value
    case other => throw new UnsupportedOperationException(
      s"graft UPDATE: only top-level columns can be assigned, got ${other.sql} — " +
        "rewrite nested-field updates as a full-column struct() assignment")
  }

  private def check(what: String, e: Expression): Unit = {
    require(!SubqueryExpression.hasSubquery(e),
      s"graft UPDATE: $what contains a subquery (${e.sql}) — materialize it " +
        "first and use the native TableLog.merge API for join-shaped updates")
    require(e.deterministic,
      s"graft UPDATE: $what is non-deterministic (${e.sql}) — a copy-on-write " +
        "rewrite must be replayable")
  }
}

/** The eager half: re-resolve the captured expressions against a fresh
  * snapshot frame (attribute references are rebound by NAME — the
  * update targets table columns only, enforced above) and commit via
  * [[TableLog.update]]. Runs as a V1 command, so `spark.sql("UPDATE …")`
  * executes it exactly once at action time. */
case class UpdateGraftTableCommand(dir: String,
                                   assigns: Seq[(String, Expression)],
                                   condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    def rebind(e: Expression) = GraftColumnAccess.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    val pred = condition.map(rebind)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    TableLog.update(spark, dir, pred, assigns.map { case (k, v) => k -> rebind(v) })
    Seq.empty
  }
}
