package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for package-private aggregate expressions graft builds on.
  * Lives in the aggregate package purely to satisfy `CollectTopK`'s
  * access modifier; exposes nothing else. */
object GraftAggBridge {
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()

  /** Tie-aware variant for rank()/dense_rank() bounds — see
    * [[CollectTopRank]]. */
  def collectTopRank(child: Expression, num: Int, orderFieldCount: Int,
                     dense: Boolean, reverse: Boolean): Expression =
    CollectTopRank(child, num, orderFieldCount, dense, reverse)
      .toAggregateExpression()
}
