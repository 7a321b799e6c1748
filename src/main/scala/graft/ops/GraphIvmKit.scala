package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax

/** Shared machinery for the signed graph-IVM family
  * ([[IncrementalPageRank]], [[IncrementalSssp]]): iterated graph
  * algorithms where level-i values depend on in-edges and in-neighbor
  * level-(i−1) values, so a batch's effect is confined to the k-hop
  * OUT-closure of its touched endpoints. Every state read here follows
  * the family posture: raw store partials are semi-joined (broadcast,
  * on key columns — key-complete per [[IncrementalAgg.currentFrom]])
  * to closure-sized key sets BEFORE any refold, so stores are scanned,
  * never shuffled whole. */
private[ops] object GraphIvmKit {

  /** A checkpointed frame REBUILT from its RDD — strips origin-plan
    * constraints that otherwise trip Union constraint rewriting when
    * derived frames meet (the hazard [[IncrementalCc]] documents). */
  def fresh(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** The k-hop OUT-closure of δ's endpoints over old ∪ new edges
    * (deleted edges still propagate: removing a contribution changes
    * the old out-neighbor). `ep` = raw edge-store partials with this
    * batch excluded, or null for a virgin store. One semi-joined store
    * scan per hop; the result is materialized small (the
    * touched-neighborhood-smaller-than-state contract). */
  def kHopOutClosure(d: DataFrame, ep: DataFrame,
                     spec: IncrementalAgg.Spec, hops: Int): DataFrame = {
    var affected = fresh(d.select(col("src").as("node"))
      .unionByName(d.select(col("dst").as("node")))
      .distinct().cutLineage())
    (1 to hops).foreach { _ =>
      val oldOut =
        if (ep == null) affected.limit(0)
        else IncrementalAgg.currentFrom(
            ep.join(broadcast(affected), col("src") === col("node"),
              "left_semi"), spec)
          .filter(col("n_rows") > 0).select(col("dst").as("node"))
      val newOut = d.join(broadcast(affected), col("src") === col("node"),
          "left_semi")
        .select(col("dst").as("node"))
      affected = fresh(affected.unionByName(oldOut).unionByName(newOut)
        .distinct().cutLineage())
    }
    affected
  }

  /** Post-batch live edges incident to `closure` on `side` (`"src"` or
    * `"dst"`): store partials semi-joined to closure keys, netted with
    * δ, net > 0 (simple-graph signed contract), projected to the
    * spec's key columns. */
  def postBatchLive(d: DataFrame, ep: DataFrame, spec: IncrementalAgg.Spec,
                    side: String, closure: DataFrame): DataFrame = {
    val keyCols = spec.keyCols.map(col)
    val dSide = d.join(broadcast(closure), col(side) === col("node"),
      "left_semi")
    val merged =
      if (ep == null) dSide
      else IncrementalAgg.currentFrom(
          ep.join(broadcast(closure), col(side) === col("node"),
            "left_semi"), spec)
        .select(keyCols :+ col("n_rows").as("__delta"): _*)
        .unionByName(dSide)
    merged.groupBy(keyCols: _*)
      .agg(sum(col("__delta")).as("__net"))
      .filter(col("__net") > 0).select(keyCols: _*)
  }

  /** Only CHANGES append: −old/+new vector diff on `keys`. Both inputs
    * must be materialized (each is referenced by both anti-joins). */
  def diffEmit(newVec: DataFrame, oldVec: DataFrame,
               keys: Seq[String]): DataFrame =
    newVec.join(oldVec, keys, "left_anti").withColumn("__delta", lit(1L))
      .unionByName(oldVec.join(newVec, keys, "left_anti")
        .withColumn("__delta", lit(-1L)))
}
