package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the explicit form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), for when the build side
  * is known-small at authoring time and the probe side is the 100 TB
  * fact table.
  *
  * A semi/inner join against a selective build side normally shuffles the
  * ENTIRE probe side on the join key before any probe row is rejected.
  * Pre-filtering the probe side with a bloom filter of the build keys
  * rejects (1 - fpp) of non-matching rows BEFORE the exchange, in the
  * scan's own stage, so shuffle bytes drop by the join's selectivity.
  * The subsequent exact join removes the bloom's false positives: the
  * final result is bit-identical to the un-pruned join (a bloom filter
  * has no false negatives), which is what makes the op oracle-checkable
  * with the plain-join SQL.
  *
  * Build path: Catalyst's `BloomFilterAggregate` over `xxhash64(key)` —
  * distributed partial aggregation, sketches OR-merged at the final
  * stage; only the finished ~`numBits/8`-byte sketch reaches the driver,
  * independent of build-side row count (same driver-payload shape as
  * Spark's own subquery-broadcast runtime filter). The probe predicate is
  * codegen'd `BloomFilterMightContain` over a `Literal` of the serialized
  * sketch, deserialized once per task, never per row.
  */
object BloomOps {

  /** The bloom aggregate as a composable Column (usable per-group, e.g.
    * one sketch per file in [[graft.sinks.FileBloomIndex]]); hashes with
    * the same xxhash64 seed the probe side uses. */
  def bloomAgg(key: Column, expectedItems: Long,
               fpp: Double = 0.01): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    ColumnBridge.column(new BloomFilterAggregate(
      XxHash64(Seq(ColumnBridge.expression(key)), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Driver-side hash of one lookup value — the exact xxhash64(seed 42)
    * the sketches were built over. xxhash64 hashes the Spark TYPE's bit
    * pattern, so an Int probe against a LONG-indexed column would hash
    * differently and silently admit zero files; pass the indexed column's
    * `keyType` to cast the probe first, exactly as the plain filter's
    * implicit cast would. */
  def hashLookupValue(value: Any, keyType: Option[DataType] = None): Long = {
    val probe = Literal(value)
    val cast: org.apache.spark.sql.catalyst.expressions.Expression =
      keyType.filter(_ != probe.dataType)
        .map(dt => Cast(probe, dt, Some("UTC"))).getOrElse(probe)
    XxHash64(Seq(cast), 42L).eval().asInstanceOf[Long]
  }

  /** Distributed build: serialized bloom of `key` over `build`, sized
    * for `expectedItems` at `fpp`. Runs a Spark job (eager). */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    val row = build.select(bloomAgg(key, expectedItems, fpp).as("bloom"))
      .head()
    if (row.isNullAt(0)) { // empty build side → an empty (all-reject) sketch
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(1, fpp).writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership predicate against a [[buildBloom]] sketch. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))

  /** Equi-join with the probe side bloom-pruned before the exchange.
    * Result is exactly `probe.join(build, probeKey === buildKey, joinType)`
    * for join types that only ever KEEP probe rows on key-match ("inner",
    * "left_semi") — false positives die in the exact join, false negatives
    * cannot exist. Do NOT use for outer/anti joins, where dropping a
    * non-matching probe row changes the result; `require`d away. */
  def prunedEquiJoin(probe: DataFrame, build: DataFrame,
                     probeKey: Column, buildKey: Column,
                     joinType: String = "inner",
                     expectedItems: Long = 1000000L,
                     fpp: Double = 0.01): DataFrame = {
    val jt = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"bloom pruning is result-preserving only for inner/left_semi joins, got $joinType")
    val bloom = buildBloom(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(bloom, probeKey))
      .join(build, probeKey === buildKey, joinType)
  }
}
