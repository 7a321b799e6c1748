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

  /** Catalyst's bounded-heap top-k collect aggregate (the engine behind
    * `Dataset.summary`'s frequent items), exposed as a Column. Partial
    * aggregation keeps per-partition heaps of at most `num` rows, so a
    * per-key top-k shuffles O(k) rows per key per partition instead of
    * sorting the full partition — the scalable form of "top k per key".
    * `reverse = false` keeps the LARGEST `num` values, emitted best-first
    * (descending); `reverse = true` keeps the smallest, ascending —
    * probed empirically, the flag reads like "reverse of descending". */
  def collectTopK(e: Column, num: Int, reverse: Boolean): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftAggBridge.collectTopK(expression(e), num, reverse))
}
