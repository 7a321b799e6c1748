package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Applies a learned BPE merge list to one word, returning its subword
  * symbols — the encode half of [[graft.ops.BpeOps]].
  *
  * Merges apply sequentially in learned-rank order, each scanning the
  * symbol list left-to-right merging non-overlapping occurrences —
  * bit-identical to the training side's `replace(symstr, a␁b, ab)`
  * rewriting, so `encode(word)` under the learned merges reproduces the
  * exact segmentation the trainer's word table ends at. Symbols start as
  * UTF-16 code units (matching `split(word, '')`).
  *
  * Codegen ships the expression instance as a reference object and calls
  * [[encodeWord]] directly — no interpreted fallback, no UDF
  * serialization per row; the merge array lives once per task. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  def encodeWord(w: UTF8String): ArrayData = {
    val s = w.toString
    var syms = new java.util.ArrayList[String](s.length)
    var ci = 0
    while (ci < s.length) { syms.add(String.valueOf(s.charAt(ci))); ci += 1 }
    var m = 0
    while (m < mergeArr.length && syms.size > 1) {
      val (a, b) = mergeArr(m)
      val out = new java.util.ArrayList[String](syms.size)
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms.get(i) == a && syms.get(i + 1) == b) {
          out.add(a + b); i += 2
        } else { out.add(syms.get(i)); i += 1 }
      }
      syms = out
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var p = 0
    while (p < arr.length) { arr(p) = UTF8String.fromString(syms.get(p)); p += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    encodeWord(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeWord($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
