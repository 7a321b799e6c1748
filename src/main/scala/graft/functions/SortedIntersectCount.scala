package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}

/** |A ∩ B| of two SORTED `array<bigint>` columns as a native Catalyst
  * expression with whole-stage codegen: one two-pointer merge over the
  * two `ArrayData` buffers — zero per-row allocation.
  *
  * The builtin `size(array_intersect(a, b))` builds a hash set and an
  * intermediate result array per row, boxing every element; on a
  * similarity self-join verifying millions of candidate pairs that is
  * gigabytes of per-batch garbage — measured as the GC-storm trigger
  * behind q175's bimodal in-sweep cost (r7 verdict). This expression
  * reads the primitive buffers in place: verification becomes pure
  * compute, invariant to heap state.
  *
  * Inputs MUST be sorted ascending (the engine's token-id arrays come
  * from `sort_array`); duplicate elements are counted min-multiset-wise
  * (equal runs advance pairwise), which equals set semantics on the
  * distinct arrays this engine feeds it. NULL on null input.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  val fnName = "sorted_intersect_count"

  /** Register in the session's function registry (idempotent), exposing
    * the expression to both the Column API (via [[apply]]) and SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")

  /** Column-API form; requires [[register]] once per session. */
  def apply(a: Column, b: Column): Column = call_function(fnName, a, b)
}
