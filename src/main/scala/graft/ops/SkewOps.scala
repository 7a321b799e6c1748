package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallbacks for when AQE's
  * runtime skew-join splitting isn't available (aggregations; joins whose
  * skew AQE can't see because it's introduced mid-stage).
  *
  * At 100 TB a single hot key (one viral user_id, one empty-string
  * grouping value) can pin an executor for hours while the rest idle.
  * Salting trades one extra cheap shuffle for even distribution:
  *
  *  - [[saltedAgg]]: groupBy (key, salt) partial-aggregates the hot key
  *    into `salts` shards, then a second tiny aggregation over shard
  *    results merges them. Works for any algebraic aggregate
  *    (re-aggregatable: sum/count/min/max — pass the merge form).
  *  - [[saltedBroadcastJoin]]: explode the SMALL side `salts`× (one copy
  *    per salt), salt the big side randomly — every hot-key row still
  *    finds its dimension row, but lands on `salts` different reducers.
  *    Only needed when the join must shuffle; if the small side fits a
  *    plain broadcast, prefer that (no shuffle at all).
  */
object SkewOps {

  /** Two-phase salted aggregation. `partialAggs` run per (key, salt);
    * `mergeAggs` combine shard partials per key. E.g. partial
    * `sum(x) as s` then merge `sum(s) as s`. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted join for a big skewed fact against a small dimension that is
    * still too big (or too dynamic) for auto-broadcast. The dimension is
    * exploded `salts`×; both sides join on (key, salt). */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
                          salts: Int, joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    bigSalted.join(smallExploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
