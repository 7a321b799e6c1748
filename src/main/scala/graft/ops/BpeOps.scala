package graft.ops

import graft.ops.Lineage.LineageSyntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * missing piece between token-count estimates and a real trained
  * vocabulary.
  *
  * The key to training at 100 TB is that BPE statistics live on the
  * WORD-FREQUENCY table, not the corpus: one corpus-sized shuffle
  * aggregates `(word, freq)` (tens of millions of rows at web scale —
  * executor-resident, never collected), and every merge iteration after
  * that is a small Spark job over that table: count adjacent symbol
  * pairs weighted by freq, pick the global max (a 1-row collect), and
  * rewrite the symbol strings with a literal `replace`. The corpus is
  * never touched again.
  *
  * Words are symbol strings joined by the `\u0001` separator (a
  * control code that never survives in whitespace-split tokens of real
  * text; merge rewriting relies on it solely as an internal boundary). Symbols start
  * as UTF-16 code units, matching `split(word, '')`.
  *
  * Encoding applies the learned merges via the codegen'd
  * [[graft.functions.BpeEncode]] expression — rank-ordered left-to-right
  * merging, bit-identical to the trainer's `replace` rewriting.
  */
object BpeOps {

  val Sep = "\u0001"

  /** Corpus → (word, freq). The only corpus-sized pass in BPE training. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** (word, freq) → (symstr, freq): each word as its initial
    * one-character symbols, Sep-joined. */
  def initSymbols(wordFreqs: DataFrame): DataFrame =
    wordFreqs.select(
      concat_ws(Sep, split(col("word"), "")).as("symstr"), col("freq"))

  /** Freq-weighted adjacent-symbol pair counts over the symbol table:
    * (l, r, cnt). The explode is `sequence` + `element_at` — codegen'd,
    * no interpreted lambdas — and the table is |vocab|-sized, not
    * corpus-sized. */
  def pairCounts(symbols: DataFrame): DataFrame =
    symbols
      .select(split(col("symstr"), Sep).as("syms"), col("freq"))
      .filter(size(col("syms")) >= 2)
      .select(col("syms"), col("freq"),
        explode(expr("sequence(1, size(syms) - 1)")).as("i"))
      .select(expr("element_at(syms, i)").as("l"),
        expr("element_at(syms, i + 1)").as("r"), col("freq"))
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))

  /** One merge applied to the symbol table: every adjacent (a, b) becomes
    * the single symbol a+b (literal non-overlapping left-to-right
    * replace). */
  def mergeStep(symbols: DataFrame, a: String, b: String): DataFrame =
    symbols.select(
      call_function("replace",
        col("symstr"), lit(a + Sep + b), lit(a + b)).as("symstr"),
      col("freq"))

  /** Learn `numMerges` merges. Ties break deterministically on
    * (cnt desc, l asc, r asc). Returns the merge list in learned order
    * plus the final symbol table. The per-iteration [[Lineage.cut]]
    * keeps lineage flat (same pattern as connectedComponents) — each
    * iteration's job is O(|vocab|), and only the 1-row argmax reaches
    * the driver. */
  def train(df: DataFrame, textCol: String,
            numMerges: Int): (Seq[(String, String)], DataFrame) = {
    var symbols = initSymbols(wordFreqs(df, textCol)).cutLineage()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCounts(symbols)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        symbols = mergeStep(symbols, a, b).cutLineage()
      }
      i += 1
    }
    (merges.toSeq, symbols)
  }

  /** Segment a word column with learned merges (codegen'd expression —
    * the merge table rides along as one reference object per task). */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(graft.functions.BpeEncode(
      ExpressionUtils.expression(word), merges))

  /** Document-level encode: normalize/tokenize, then concatenate each
    * word's subword symbols — one projection, zero shuffles. */
  def encodeText(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextOps.tokens(text), w => encodeWord(w, merges)))
}
