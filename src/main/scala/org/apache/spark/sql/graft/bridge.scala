package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made the conversion
  * utilities `private[sql]` (Column is now the Connect-agnostic API), so
  * custom native Expressions need this one-file shim inside the
  * `org.apache.spark.sql` package to be exposed as `Column`s.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Names a DSL-built Column references. `expression` returns a LAZY
    * ColumnNodeExpression wrapper (no catalyst children to walk), so this
    * converts eagerly through the classic ColumnNode converter first.
    */
  def referencedNames(c: Column): Set[String] =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
      .collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }.toSet
}
