package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables for co-located, shuffle-free joins — the
  * pre-partitioning technique for fact↔fact joins that recur on the same
  * key (SURVEY.md scale posture: "bucketing for co-located joins").
  *
  * Writing both sides bucketed by the join key into the session catalog
  * lets Catalyst plan a SortMergeJoin with ZERO Exchange operators: each
  * bucket pair joins locally. On a 1000-executor cluster this removes the
  * two largest shuffles of a recurring pipeline entirely — the classic
  * amortize-once layout investment for tables joined every run.
  *
  * Bucketing metadata lives in the session/warehouse catalog
  * (`spark.sql.warehouse.dir`); a persistent metastore carries it across
  * sessions in production.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan for `df` contains no SHUFFLE exchange —
    * the assertion that bucketing removed the repartitioning. (A broadcast
    * exchange is not a shuffle; small sides may still broadcast.) */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning")
  }
}
