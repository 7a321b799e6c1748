package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word k-gram extraction for the dedup family.
  *
  * Semantically identical to the declarative pipeline
  * `array_distinct(transform(sequence(0, n-k), i -> concat_ws(" ",
  * slice(split(trim(regexp_replace(lower(text), "\s+", " ")), " "), i+1,
  * k))))` — but that form nests higher-order lambdas, which Catalyst
  * evaluates INTERPRETED (per-element expression-tree dispatch, boxed
  * allocations), not in whole-stage codegen. Profiled at bench scale the
  * HOF chain alone cost ~5.6 s of q27's 8 s (and recurs in q26/q59/q60);
  * this expression is one tight loop per row, codegen'd via a static
  * call, and cut the shingle stage to well under a second.
  *
  * Exact-parity notes (each step mirrors the Catalyst builtin it
  * replaces, so results are bit-identical to the declarative form and the
  * HOF twin kept in TextOps for the parity spec):
  *  - lowercase via `UTF8String.toLowerCase` (what `lower` uses),
  *  - whitespace collapse via Java regex `\s+` (what `regexp_replace`
  *    uses), trim of ASCII space only (what `trim` trims),
  *  - `< k` tokens → single shingle = whole normalized text,
  *  - distinct keeps first occurrence (as `array_distinct`),
  *  - hashes via `XxHash64Function.hash(_, StringType, 42L)` (exactly
  *    `xxhash64`), optional `pmod` into the MinHash universe.
  */
object ShingleOps {
  private val WS = Pattern.compile("\\s+")

  /** trim(regexp_replace(lower(text), "\s+", " ")) — Spark's `trim`
    * strips ASCII spaces only, so String.trim (which strips all control
    * chars) would NOT be equivalent. */
  def normalize(text: UTF8String): String = {
    val collapsed = WS.matcher(text.toLowerCase.toString).replaceAll(" ")
    var from = 0
    var to = collapsed.length
    while (from < to && collapsed.charAt(from) == ' ') from += 1
    while (to > from && collapsed.charAt(to - 1) == ' ') to -= 1
    collapsed.substring(from, to)
  }

  /** Word k-grams in document order; `distinct` keeps first occurrences
    * only (as `array_distinct`), non-distinct keeps every occurrence (the
    * multiset the repetition metrics need). */
  private def grams(text: UTF8String, k: Int,
                    distinct: Boolean): java.util.ArrayList[String] = {
    val norm = normalize(text)
    val toks = norm.split(" ", -1)
    val out = new java.util.ArrayList[String]
    if (toks.length < k) { out.add(norm); return out }
    val seen = if (distinct) new java.util.HashSet[String] else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    out
  }

  def shingleStrings(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val gs = grams(text, k, distinct)
    val out = new Array[Any](gs.size)
    var p = 0
    while (p < out.length) { out(p) = UTF8String.fromString(gs.get(p)); p += 1 }
    new GenericArrayData(out)
  }

  /** xxhash64 of each k-gram; `mod > 0` applies `pmod(hash, mod)` (the
    * MinHash 2^31-1 universe), `mod = 0` keeps the full 64-bit value
    * (decontamination keys). */
  def shingleHashes(text: UTF8String, k: Int, mod: Long,
                    distinct: Boolean): ArrayData = {
    val gs = grams(text, k, distinct)
    val out = new Array[Long](gs.size)
    var p = 0
    while (p < out.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(gs.get(p)), StringType, 42L)
      out(p) = if (mod > 0L) ((h % mod) + mod) % mod else h
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

private[graft] trait ShingleLike extends UnaryExpression {
  def k: Int
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
}

/** Word k-grams of the normalized text, as `array<string>`. */
case class Shingles(child: Expression, k: Int, distinct: Boolean = true)
    extends ShingleLike {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"
  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleStrings(input.asInstanceOf[UTF8String], k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.shingleStrings($c, $k, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** xxhash64 per word k-gram, optionally folded into `[0, mod)` by pmod,
  * as `array<bigint>`. */
case class ShingleHashes(child: Expression, k: Int, mod: Long,
                         distinct: Boolean = true) extends ShingleLike {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[UTF8String], k, mod, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.shingleHashes($c, $k, ${mod}L, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
