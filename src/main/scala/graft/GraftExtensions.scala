package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, DotProductF, DotProductI8, SqDistF}

/** Session extensions registering graft's native Catalyst expressions
  * (`cosine_similarity` / `dot_product_f` / `dot_product_i8` /
  * `sq_dist_f` in SQL and via `call_function`) plus the
  * [[graft.plans.TopKRewrite]] optimizer rule that turns naive
  * `row_number() <= k` window top-k queries into bounded-heap
  * aggregates. Activate with `.withExtensions(new GraftExtensions)`
  * (done by [[GraftSession]]) or
  * `spark.sql.extensions=graft.GraftExtensions` on any stock session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    e.injectOptimizerRule(_ => graft.plans.MaterializedAggRewrite)
    e.injectOptimizerRule(_ => graft.plans.MaterializedJoinRewrite)
    e.injectFunction((
      FunctionIdentifier(CosineSimilarity.fnName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.fnName),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(DotProductF.fnName),
      new ExpressionInfo(classOf[DotProductF].getName, DotProductF.fnName),
      exprs => DotProductF(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(DotProductI8.fnName),
      new ExpressionInfo(classOf[DotProductI8].getName, DotProductI8.fnName),
      exprs => DotProductI8(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(SqDistF.fnName),
      new ExpressionInfo(classOf[SqDistF].getName, SqDistF.fnName),
      exprs => SqDistF(exprs(0), exprs(1))))
  }
}
