package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** `private[sql]` accessor (the GraftSparkAccess precedent): Spark 4's
  * classic Column is built from a ColumnNode, and the Expression bridge
  * (`classic.ExpressionUtils.column`) is sql-private. graft's UPDATE
  * command needs exactly that bridge to rebind captured analysis-time
  * expressions onto a fresh snapshot frame.
  */
object GraftColumnAccess {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
