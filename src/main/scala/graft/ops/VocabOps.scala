package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction and corpus id-encoding —
  * the "tokenize to ids" step between curation and training.
  *
  * Reference behavior: the reference pipeline ships text to the trainer
  * and leaves numericalization to it; at engine scale the vocab build is
  * a corpus-wide aggregation and the encode pass is a full rewrite, so
  * both belong in the engine (and both are oracle-gated, q140).
  *
  * Scale shape:
  *  - `buildVocab` is one (token → count) aggregation with map-side
  *    combine — the only corpus-sized shuffle — followed by a top-N
  *    over the DISTINCT-token table (|vocab| rows, not corpus rows).
  *  - `encode` collects the bounded vocab to the driver ONCE (topN rows
  *    by construction — this is a deliberate, size-capped collect) and
  *    ships it inside a [[graft.functions.VocabEncode]] expression:
  *    encoding is then a pure scan projection, no join, no shuffle of
  *    the corpus, arrays built in token order by construction.
  */
object VocabOps {

  /** (tok, id) vocabulary: the `topN` most frequent tokens of
    * `textCol` under [[TextOps.tokens]] tokenization, ids 1..topN in
    * (count desc, token asc) order — rank 1 = most frequent. Id 0 is
    * reserved for OOV by [[encode]]'s default. The (cnt, tok) sort key
    * is a deterministic total order, so the vocab — and everything
    * encoded with it — is reproducible across runs and engines. */
  /** Upper bound on the vocab rows [[encode]] will collect to the driver.
    * 2²² tokens ≈ 4M (tok, id) rows — generous for any real vocabulary
    * (GPT-scale BPE vocabs are ≤ 2⁸ k) while refusing the accidental
    * "topN = corpus cardinality" call that would OOM the driver. */
  val MaxDriverVocab: Int = 1 << 22

  def buildVocab(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
      .select(col("tok"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))).as("id"))
  }

  /** Token-id array column for `textCol` under a driver-side vocab
    * (token → id); unknown tokens map to `oovId`. */
  def encodeColumn(text: Column, vocab: Seq[(String, Int)],
                   oovId: Int = 0): Column =
    ExpressionUtils.column(graft.functions.VocabEncode(
      ExpressionUtils.expression(TextOps.tokens(text)), vocab, oovId))

  /** Encodes the corpus against the `topN`-token vocabulary built from
    * it: adds `ids` (array<int>, token order preserved) with OOV = 0.
    * One bounded vocab collect (enforced ≤ [[MaxDriverVocab]]); the
    * corpus pass is shuffle-free. */
  def encode(df: DataFrame, textCol: String, topN: Int,
             idsCol: String = "ids"): DataFrame = {
    require(topN <= MaxDriverVocab,
      s"encode collects the vocab to the driver: topN=$topN exceeds the " +
        s"$MaxDriverVocab cap. A vocabulary this large will not fit a " +
        s"broadcast expression — shrink topN or join against buildVocab's " +
        s"distributed (tok, id) table instead.")
    val vocab = buildVocab(df, textCol, topN)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    df.withColumn(idsCol, encodeColumn(col(textCol), vocab))
  }
}
