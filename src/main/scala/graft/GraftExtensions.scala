package graft

import graft.functions.{DotProductExpr, TopKPairs}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native Catalyst functions.
  *
  * Wire up with `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions`. Once injected,
  * the functions are first-class in SQL and via
  * `functions.call_function("vec_dot", a, b)` — no UDF registry, full
  * codegen in the hot path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, null, "vec_dot",
        "vec_dot(a, b) - left-to-right dot product of two array<double> columns", ""),
      (children: Seq[Expression]) => DotProductExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, null, "topk_pairs",
        "topk_pairs(score, id, k) - bounded map-side top-k (score DESC, id ASC) per group",
        ""),
      (children: Seq[Expression]) =>
        TopKPairs(children.head, children(1), children(2))))
  }
}
