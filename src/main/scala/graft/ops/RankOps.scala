package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-key top-k without sorting — the ranking primitive "top 10 orders
  * per customer over 100 TB".
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k`) SORTS every key's entire row group: at corpus
  * scale that is a full shuffle plus an O(n log n) sort of all 100 TB to
  * keep a few rows per key. This operator instead aggregates with
  * Catalyst's bounded-heap `CollectTopK`: map-side partial aggregation
  * maintains a ≤k-row heap per key per partition, the shuffle carries
  * only those heaps (O(k·keys) rows total), and the final merge keeps the
  * global k — no Sort node anywhere in the plan (gated in
  * PlanAssertionsSpec).
  *
  * Ordering is the lexicographic struct order of `orderBy ++ tieBreak`,
  * so pass an explicit tie-break column (e.g. the row id) for a total
  * order — that is what makes results deterministic and oracle-exact.
  * `largest = true` ranks descending (top values first).
  */
object RankOps {

  /** Top `k` rows per `keys`, ranked 1..k in `rank`. `payload` columns
    * ride inside the heap rows and come back unchanged. */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
                 k: Int, largest: Boolean = true,
                 payload: Seq[String] = Seq.empty): DataFrame = {
    val ordered = struct((orderBy ++ payload.map(col)): _*)
    val keyCols = keys.map(col)
    df.groupBy(keyCols: _*)
      .agg(ColumnBridge.collectTopK(ordered, k, reverse = !largest).as("__top"))
      .select(keyCols :+ posexplode(col("__top")).as(Seq("__pos", "__row")): _*)
      .select(keyCols ++ Seq((col("__pos") + 1).cast("int").as("rank"),
        expr("__row.*")): _*)
  }
}
