package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total occurrence count of EVERY pattern in a (possibly huge) literal
  * blocklist, in one O(len + matches) pass — the C4-style "blocklist
  * filtering" primitive (bad-word/boilerplate phrase lists run to tens of
  * thousands of entries; N `instr`/`rlike` passes are O(N·len) and regex
  * alternation blows up the NFA).
  *
  * Aho-Corasick over raw UTF-8 BYTES: the automaton (goto/fail/output
  * tables) is built once per plan on first use from the pattern list the
  * expression captures, ships to executors as a codegen reference object
  * (the bounded-state-rides-the-plan rule, docs/SCALING.md §18), and each
  * row is a single scan — blocklist size only affects build time and
  * memory (~256 ints per node), never per-row cost.
  *
  * Counts are ALL match positions (overlapping included). For patterns
  * with no self-border (no proper prefix = suffix — true of typical word
  * phrases) this equals the non-overlapping count, which is what lets a
  * SQL oracle replay it with replace()-length arithmetic. Empty patterns
  * are rejected; byte-level matching means case/Unicode normalization is
  * the caller's job (normalize first, as the corpus pipeline does). */
case class MultiSubstringCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "empty blocklist")
  require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_substring_count"

  /** goto as per-node byte→state maps (dense arrays would be 256 ints per
    * node; byte-keyed hash maps keep big blocklists compact), fail links,
    * and per-node TERMINAL pattern counts (suffix-summed via fail links so
    * evaluation never walks the fail chain). */
  @transient private lazy val automaton: (Array[java.util.HashMap[Byte, Integer]], Array[Int], Array[Long]) = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Byte, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(0L)
    patterns.foreach { p =>
      val bytes = p.getBytes("UTF-8")
      var s = 0
      bytes.foreach { b =>
        val nxt = gotoMaps(s).get(b)
        s = if (nxt != null) nxt.intValue()
        else {
          gotoMaps += new java.util.HashMap[Byte, Integer]()
          ends += 0L
          gotoMaps(s).put(b, gotoMaps.size - 1)
          gotoMaps.size - 1
        }
      }
      ends(s) += 1L
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Int]()
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      gotoMaps(u).forEach { (b, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(b) == null) f = fail(f)
        val t = gotoMaps(f).get(b)
        fail(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        // suffix-sum: matches ending at v include those ending at fail(v)
        ends(v) += ends(fail(v))
        queue.add(v)
      }
    }
    (gotoMaps.toArray, fail, ends.toArray)
  }

  def countIn(input: UTF8String): Long = {
    val (gotoMaps, fail, ends) = automaton
    val bytes = input.getBytes
    var s = 0
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var nxt = gotoMaps(s).get(b)
      while (nxt == null && s != 0) { s = fail(s); nxt = gotoMaps(s).get(b) }
      s = if (nxt != null) nxt.intValue() else 0
      total += ends(s)
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    countIn(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", this,
      classOf[MultiSubstringCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countIn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiSubstringCount =
    copy(child = newChild)
}
