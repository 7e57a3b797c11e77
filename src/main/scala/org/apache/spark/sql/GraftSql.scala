package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's `private[sql]` Column internals.
  *
  * Spark 4 removed the public `Column(Expression)` constructor (Column now
  * wraps a connect-compatible `ColumnNode`); the supported conversion lives
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is package
  * private. This object is the single place the engine crosses that
  * boundary — everything else stays on public API.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
