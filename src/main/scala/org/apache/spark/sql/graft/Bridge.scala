package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); custom
  * Catalyst expressions exposed as Columns need them, so this object lives
  * inside the sql package namespace — the standard pattern for Spark
  * extension libraries. */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
