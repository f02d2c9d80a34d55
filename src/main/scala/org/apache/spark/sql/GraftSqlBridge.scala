package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Spark 4's Column is node-backed and
  * the Expression↔Column converters (`classic.ExpressionUtils`) are
  * package-private. Hosting this one-file adapter inside the sql package
  * is the established pattern for libraries that ship custom Catalyst
  * expressions (no internals are modified — only re-exported).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
