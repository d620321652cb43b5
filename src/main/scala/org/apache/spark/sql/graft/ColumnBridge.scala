package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's column-node internals: Spark 4 removed the public
  * `new Column(Expression)` constructor, so custom Catalyst expressions
  * (SURVEY.md §7.5) get wrapped here. Lives under org.apache.spark.sql to
  * reach the package-private ExpressionUtils.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
