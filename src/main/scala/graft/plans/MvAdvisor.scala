package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, countDistinct, count => cnt, lit}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Workload-driven MV advisor (SURVEY §2 R129) — the missing third of
  * the materialized-view lifecycle: [[RewriteToMv]] SERVES a summary
  * and IncrementalAgg keeps one FRESH, but somebody has to decide WHICH
  * summaries to build. This is that somebody: feed it the workload (the
  * DataFrames a dashboard fleet actually runs), it extracts every
  * aggregate [[RewriteToMv]] could serve — grouping on plain columns,
  * count(*)/sum(integral column) aggregates, filters confined to
  * columns the MV would carry — unions them into one per-table
  * candidate (dims = all grouping+filter columns seen, sums = all
  * summed columns; the rewrite serves any SUBSET grouping, so the
  * union candidate covers every contributing query), and scores it by
  * measured cell-count reduction: |distinct dim tuples| / |base rows|,
  * the exact factor by which the MV shrinks every serve.
  *
  * Non-conforming queries (float sums, avg/min/max, expression
  * grouping, filters on non-carried columns) are skipped — advising an
  * MV the rewrite can't serve, or one whose two-level float sums would
  * drift, would be worse than no advice. The estimate pass runs ONE
  * distinct-count aggregate per recommended table.
  */
object MvAdvisor {

  final case class Candidate(basePath: String, dims: Seq[String],
                             sums: Seq[String], hits: Int,
                             mvRows: Long, baseRows: Long) {
    def reduction: Double = if (baseRows == 0) 1.0 else mvRows.toDouble / baseRows
  }

  /** The (table, dims∪filterCols, sums) triple of one query, when the
    * MV rewrite could serve it; None otherwise. */
  private[graft] def conformingShape(df: DataFrame)
      : Option[(String, Set[String], Set[String])] = {
    def scanOf(p: LogicalPlan, filterCols: Set[String])
        : Option[(String, Set[String])] = p match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
        scanOf(child, filterCols)
      case Filter(cond, child) if cond.deterministic =>
        scanOf(child, filterCols ++ cond.references.map(_.name))
      case SubqueryAlias(_, child) => scanOf(child, filterCols)
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.toString -> filterCols)
        case _ => None
      }
      case _ => None
    }
    df.queryExecution.analyzed match {
      case Aggregate(groupingExprs, aggExprs, child, _) =>
        val dims = groupingExprs.collect { case a: Attribute => a.name }
        if (dims.size != groupingExprs.size) return None // expression grouping
        val sums = scala.collection.mutable.Set.empty[String]
        val conforming = aggExprs.forall {
          case a: Attribute => dims.contains(a.name)
          case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
            case _: Count => true
            case Sum(a: Attribute, _)
                if a.dataType == LongType || a.dataType == IntegerType =>
              sums += a.name; true
            case _ => false
          }
          case _ => false
        }
        if (!conforming) None
        else scanOf(child, Set.empty).flatMap { case (path, filterCols) =>
          val allDims = dims.toSet ++ filterCols
          // A global aggregate (no GROUP BY, no filter) leaves allDims
          // empty — a dimension-less MV is just a 1-row cache, and the
          // countDistinct in analyze() needs at least one column.
          if (allDims.isEmpty) None else Some((path, allDims, sums.toSet))
        }
      case _ => None
    }
  }

  /** Analyze a workload: one union candidate per base table, scored by
    * measured reduction, tables with at least `minHits` conforming
    * queries, most-hit first. */
  def analyze(spark: SparkSession, workload: Seq[DataFrame],
              minHits: Int = 2): Seq[Candidate] = {
    val shapes = workload.flatMap(conformingShape)
    shapes.groupBy(_._1).toSeq
      .map { case (path, qs) =>
        val dims = qs.flatMap(_._2).distinct.sorted
        val sums = qs.flatMap(_._3).distinct.sorted
        val base = spark.read.parquet(path)
        val est = base.agg(
          countDistinct(dims.head, dims.tail: _*).as("m"),
          cnt(lit(1)).as("n")).head()
        Candidate(path, dims, sums, hits = qs.size,
          mvRows = est.getLong(0), baseRows = est.getLong(1))
      }
      .filter(_.hits >= minHits)
      .sortBy(c => (-c.hits, c.basePath))
  }

  /** Build + register every recommendation (the act-on-advice half). */
  def buildRecommended(spark: SparkSession, recs: Seq[Candidate],
                       mvRoot: String): Unit =
    recs.zipWithIndex.foreach { case (c, i) =>
      graft.operators.MaterializedView.build(
        spark, c.basePath, s"$mvRoot/mv$i", c.dims, c.sums)
    }
}
