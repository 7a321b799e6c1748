package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides the classic
  * `ExpressionUtils` behind `private[sql]`, so libraries that define
  * native Catalyst expressions re-export it from inside the package —
  * the same access pattern Spark connector/extension projects use. Only
  * these two conversions are exposed; nothing else private is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
