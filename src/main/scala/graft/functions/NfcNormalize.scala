package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native,
  * codegen'd expression.
  *
  * Web-crawled corpora mix composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) forms of the same text; without canonicalization,
  * fingerprint-based dedup treats them as distinct documents and token
  * statistics double-count variants. Reference behavior: the ingest layer
  * normalizes text before hashing (promptly/adapters/data/postgres/
  * datagen.py seeds already-clean text; the dbt staging models hash raw
  * strings, so canonical equivalence is the engine's job here).
  *
  * Scale shape: `Normalizer.isNormalized` is a cheap scan that returns
  * true for pure-ASCII and already-composed text — the overwhelmingly
  * common case in a real corpus — so the fast path allocates nothing and
  * returns the input `UTF8String` as-is. Only strings that actually
  * contain decomposable sequences pay the `String` round-trip. Codegen
  * ships the expression as a reference object (same pattern as
  * [[BpeEncode]]): one virtual call per row, no UDF serialization, stays
  * inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def normalizeUtf8(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.normalizeUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
