package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column.expr` / `new Column(expr)`
  * bridge; the supported conversion lives in the sql-private
  * `classic.ExpressionUtils`. This shim re-exports it for graft's
  * custom Catalyst expressions — the standard pattern for Spark
  * extension libraries that ship native expressions.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
