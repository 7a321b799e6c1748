package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, DotProductF}

/** Session extensions registering graft's native Catalyst expressions so
  * every session built with them exposes `cosine_similarity` /
  * `dot_product_f` in SQL and via `call_function` — no per-session
  * `register` call needed. Activate with
  * `.withExtensions(new GraftExtensions)` (done by [[GraftSession]]) or
  * `spark.sql.extensions=graft.GraftExtensions` on any stock session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(CosineSimilarity.fnName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.fnName),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(DotProductF.fnName),
      new ExpressionInfo(classOf[DotProductF].getName, DotProductF.fnName),
      exprs => DotProductF(exprs(0), exprs(1))))
  }
}
