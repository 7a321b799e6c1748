package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Maps a token array to its vocabulary-id array (unknown tokens →
  * `oovId`) — the tokenize-to-ids step of training-data preparation.
  *
  * The vocabulary rides INSIDE the expression as a reference object
  * (the [[BpeEncode]] pattern): the driver ships it once per task in the
  * serialized plan, the lookup table builds lazily per executor, and the
  * corpus itself never shuffles or joins — encoding is a pure scan
  * projection. That is the right 100 TB shape for any bounded vocab
  * (quarter-million entries is a few MB); an exploded-join encoding
  * would shuffle one row per TOKEN of a 100 TB corpus to reassemble
  * arrays afterwards.
  *
  * Keys are stored as [[UTF8String]] so per-row probes compare raw UTF-8
  * bytes — no String decode per token. */
case class VocabEncode(child: Expression, vocab: Seq[(String, Int)], oovId: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vocab_encode"

  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (tok, id) => m.put(UTF8String.fromString(tok), id) }
    m
  }

  def encodeTokens(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val id = if (input.isNullAt(i)) null
               else table.get(input.getUTF8String(i))
      out(i) = if (id == null) oovId else id.intValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encodeTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabEncode", this, classOf[VocabEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncode =
    copy(child = newChild)
}
