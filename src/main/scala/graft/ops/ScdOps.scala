package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builders over change streams.
  *
  * The reference's lakehouse keeps only the latest image per key
  * (merge-by-PK, /root/reference/dbt/promptly/models/raw/raw_provider_postgres.sql:9-10);
  * SCD Type-2 is the standard companion a warehouse user expects: every
  * attribute change becomes a validity interval `[valid_from, valid_to)`
  * with `is_current` marking the open row.
  *
  * Scale shape: ONE hash shuffle on the dimension key. Change detection
  * (lag), interval close (lead) and the current flag are window functions
  * over that same (partition, order) — the change filter preserves both
  * partitioning and sort order, so Catalyst plans a single Exchange and a
  * single Sort for the whole chain. Nothing is collected; no global sort
  * except the caller's final presentation ORDER BY.
  */
object ScdOps {

  /** Compress a change stream into SCD-2 validity intervals.
    *
    * @param df        change events (one row per observed version)
    * @param keyCols   dimension key columns
    * @param orderCols total per-key event order (MUST be deterministic —
    *                  include a unique tiebreaker column)
    * @param attrCols  tracked attribute columns: a row opens a new interval
    *                  iff the attribute tuple differs (null-safely) from the
    *                  key's previous event
    * @param validFrom column supplying interval start values (often the
    *                  event timestamp; any orderable type)
    * @return one row per interval: keys ++ attrs ++ orderCol carriers ++
    *         `valid_from`, `valid_to` (null = open), `is_current`
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      attrCols: Seq[String],
      validFrom: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changes = df
      .withColumn("_vf", validFrom)
      .withColumn("_prev", lag(attrs, 1).over(w))
      // null-safe "differs from previous": first event of a key always opens
      .filter(!(col("_prev") <=> attrs))
      .drop("_prev")
    changes
      .withColumn("valid_from", col("_vf"))
      .withColumn("valid_to", lead(col("_vf"), 1).over(w))
      .withColumn("is_current", lead(col("_vf"), 1).over(w).isNull)
      .drop("_vf")
  }

  /** Change-data-feed between two images of the same table (the Iceberg
    * `changelog` / Delta CDF analog): emits one row per key that was
    * inserted, deleted, or updated between `oldDf` and `newDf`, carrying
    * the surviving image's values (new image; old image for deletes).
    * Unchanged keys are dropped.
    *
    * Scale shape: ONE full-outer equi-join on the key (sort-merge at
    * scale; both sides shuffle once on the same key, AQE handles skew).
    * Attribute comparison is a null-safe struct equality inside the join
    * projection — no second pass, no window, nothing collected.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val attrCols = newDf.columns.filterNot(keyCols.contains).toSeq
    require(attrCols.forall(oldDf.columns.contains),
      s"old image missing columns: ${attrCols.filterNot(oldDf.columns.contains)}")
    val o = oldDf.select((keyCols ++ attrCols).map(col): _*)
      .withColumn("_old", struct(attrCols.map(col): _*))
      .select(keyCols.map(col) :+ col("_old"): _*)
    val n = newDf
      .withColumn("_new", struct(attrCols.map(col): _*))
      .select(keyCols.map(col) :+ col("_new"): _*)
    // using-columns full outer join coalesces the key columns for us
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(!(col("_old") <=> col("_new")), lit("update")))
      .filter(col("change_type").isNotNull)
      .withColumn("_img", coalesce(col("_new"), col("_old")))
      .select(keyCols.map(col) ++ Seq(col("change_type")) ++
        attrCols.map(c => col(s"_img.$c").as(c)): _*)
  }
}
