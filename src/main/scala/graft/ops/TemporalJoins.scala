package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — as-of join and range
  * (interval) join — built by composition (SURVEY-preference (a)): both
  * reduce to equi-shuffles + window algebra, so they inherit Catalyst/AQE
  * planning instead of needing a custom SparkPlan, and neither degrades to
  * a nested-loop join at scale.
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the latest right row whose
    * `rightTs` <= the left row's `leftTs` (per key), optionally within
    * `tolerance` time units.
    *
    * Formulation: union both sides tagged, ONE shuffle on the key, ONE
    * per-partition sort on (ts, side), carry right values forward with
    * `last(_, ignoreNulls)` over an unbounded-preceding window, keep left
    * rows. Cost is sort-merge-like — O((|L|+|R|) log p) per partition —
    * versus the O(|L|·|R|) nested loop Spark would plan for the raw
    * inequality join. Right rows at exactly leftTs match (inclusive), with
    * the right side sorted first on ties.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("long"))
    val lPadded = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__v_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(rightTs).cast("long"))
    val rPadded = leftCols.filterNot(keys.contains).foldLeft(
      valueCols.foldLeft(r)((df, c) => df.withColumn(s"__v_$c", col(c))))(
      (df, c) => if (df.columns.contains(c)) df else
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lPadded
      .select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        Seq(col("__ts"), col("__side"), col("__rts")) ++
        valueCols.map(c => col(s"__v_$c")): _*)
      .unionByName(rPadded
        .select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
          Seq(col("__ts"), col("__side"), col("__rts")) ++
          valueCols.map(c => col(s"__v_$c")): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(
      unioned.withColumn("__last_rts", last(col("__rts"), ignoreNulls = true).over(w)))(
      (df, c) => df.withColumn(s"__c_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w)))

    val matched = carried.filter(col("__side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        valueCols.foldLeft(matched)((df, c) =>
          df.withColumn(s"__c_$c",
            when(col("__ts").cast("long") - col("__last_rts") <= tol, col(s"__c_$c"))))
      case None => matched
    }
    withTol.select(leftCols.map(col) ++
      valueCols.map(c => col(s"__c_$c").as(s"asof_$c")): _*)
  }

  /** Range (interval) join: points `p` joined to intervals with
    * `start <= p <= end`, per key.
    *
    * Formulation: bucketize the domain with `bucketWidth`; each interval
    * explodes into the buckets it spans, each point lands in exactly one
    * bucket, and the join becomes an EQUI join on (key, bucket) + a cheap
    * residual filter — hash-partitionable, AQE-skew-splittable, and no
    * duplicate pairs (a pair can only meet in the point's bucket). Pick
    * bucketWidth ≈ median interval length; intervals spanning many buckets
    * replicate accordingly (the classic time/space tradeoff). */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                keys: Seq[String], bucketWidth: Double): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(iv, ("__bucket" +: keys).toSeq) // equi join on (bucket, keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: pairs of intervals (per key) with
    * `aStart <= bEnd && bStart <= aEnd`, both endpoints inclusive — the
    * interval×interval generalization of [[rangeJoin]].
    *
    * Both sides explode into the buckets they span and meet by EQUI join
    * on (key, bucket); since BOTH sides replicate, an overlapping pair
    * meets in every shared bucket, so each pair is kept ONLY in the
    * bucket of `max(aStart, bStart)` — a point that lies inside both
    * intervals whenever they overlap, hence exactly one surviving copy
    * per pair and completeness by construction (no heuristic loss). Cost
    * is the classic replication trade: rows × (span/bucketWidth); pick
    * `bucketWidth` ≈ the median interval length. Equi-join shape means
    * hash partitioning, AQE skew splitting, and never a nested loop —
    * the plan DuckDB's IEJoin gets from a specialized operator, from
    * composition. */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          keys: Seq[String], bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val ab = a.withColumn("__bucket", explode(sequence(
      floor(col(aStart) / bucketWidth).cast("long"),
      floor(col(aEnd) / bucketWidth).cast("long"))))
    val bb = b.withColumn("__bucket", explode(sequence(
      floor(col(bStart) / bucketWidth).cast("long"),
      floor(col(bEnd) / bucketWidth).cast("long"))))
    ab.join(bb, ("__bucket" +: keys).toSeq)
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") ===
        floor(greatest(col(aStart), col(bStart)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
