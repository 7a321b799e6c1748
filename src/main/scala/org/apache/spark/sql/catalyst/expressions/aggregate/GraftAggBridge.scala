package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for package-private aggregate expressions graft builds on.
  * Lives in the aggregate package purely to satisfy `CollectTopK`'s
  * access modifier; exposes nothing else. */
object GraftAggBridge {
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
