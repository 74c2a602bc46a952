// Lives under org.apache.spark.sql to reach the Column<->Expression
// bridge that Spark 4 scopes private[sql] (same pattern as
// GraftExpressions.scala). No logic here — just the two casts the
// graft.sources data-skipping analyzer needs.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object CatalystBridge {
  /** The Catalyst expression tree behind a user-built Column. */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
