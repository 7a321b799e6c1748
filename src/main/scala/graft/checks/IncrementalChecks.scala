package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg
import graft.sinks.AppendOnlyStore

/** The reference's dbt-style data tests (`unique` T1, `not_null` T2,
  * `relationships` T3 — `checks/Checks.scala`) as MAINTAINED views under
  * CDC: violation counts stay current through signed insert/update/
  * delete waves at delta cost, instead of re-running each test as a
  * full-table scan per pipeline run (the reference executes its tests
  * as fresh Trino queries every invocation — at 100 TB that is three
  * table scans per run for counts that a maintained key multiset
  * answers from state).
  *
  * State = two signed [[IncrementalAgg]] key multisets (child FK values,
  * parent PK values). Everything the three tests need is derivable from
  * net key multiplicities:
  *
  *  - `not_null`: the NULL key group's net count (key columns are
  *    null-safe in the store's hash key);
  *  - `unique` (on the parent): Σ max(n−1, 0) over key groups — the
  *    count of EXCESS duplicate rows;
  *  - `relationships`: Σ n over non-null child groups whose key has no
  *    live parent — a key-aligned anti-join of two aggregates, never a
  *    row-level join.
  *
  * Per-batch cost: one batch-sized fold + append per side. Serve cost:
  * one scan of each key-group state (∝ distinct keys, not rows), one
  * hash anti-join between them. Replays no-op at the store manifests;
  * compaction is the stores' own. */
object IncrementalChecks {

  final case class Stores(child: AppendOnlyStore, parent: AppendOnlyStore)

  private val spec = IncrementalAgg.Spec(Seq("k"), Nil)

  def stores(spark: SparkSession, root: String): Stores = Stores(
    new AppendOnlyStore(spark, s"$root/child",
      prefixCol = "__agg_key", prefixChars = 1),
    new AppendOnlyStore(spark, s"$root/parent",
      prefixCol = "__agg_key", prefixChars = 1))

  private def keyed(batch: DataFrame, keyCol: String,
                    deltaCol: Option[String]): DataFrame = {
    val d = deltaCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    batch.select(col(keyCol).as("k"), d.as("__delta"))
  }

  /** Maintain the child (FK) side with one signed batch. */
  def appendChild(st: Stores, batch: DataFrame, keyCol: String,
                  batchId: Long, deltaCol: Option[String] = None): Unit =
    IncrementalAgg.appendDelta(st.child,
      keyed(batch, keyCol, deltaCol), spec, batchId, "__delta")

  /** Maintain the parent (PK) side with one signed batch. */
  def appendParent(st: Stores, batch: DataFrame, keyCol: String,
                   batchId: Long, deltaCol: Option[String] = None): Unit =
    IncrementalAgg.appendDelta(st.parent,
      keyed(batch, keyCol, deltaCol), spec, batchId, "__delta")

  private def groups(store: AppendOnlyStore): DataFrame =
    if (store.hasSchema)
      IncrementalAgg.current(store, spec)
        .select(col("k"), col("n_rows").as("n"))
    else store.session.range(0)
      .select(col("id").as("k"), col("id").as("n"))

  /** The three maintained test results, one row:
    * `(n_orphans, n_null_fk, n_dup_pk)` — rows violating
    * relationships / not_null on the child, and excess duplicate rows
    * on the parent key. All zero on a fully-consistent state. */
  def current(st: Stores): DataFrame = {
    val child = groups(st.child)
    val parent = groups(st.parent)
    val livePk = parent.filter(col("n") > 0).select(col("k"))
    val orphans = child
      .filter(col("k").isNotNull && col("n") > 0)
      .join(livePk, Seq("k"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_orphans"))
    val nulls = child.filter(col("k").isNull)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_null_fk"))
    val dups = parent.filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_dup_pk"))
    orphans.crossJoin(broadcast(nulls)).crossJoin(broadcast(dups))
  }

  /** Compact both key multisets (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.child, spec)
    IncrementalAgg.compact(st.parent, spec)
  }
}
