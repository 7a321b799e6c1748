package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone map — min/max per data file for chosen columns, the
  * range-predicate twin of [[FileBloomIndex]] (which serves equality).
  *
  * Parquet already keeps row-group min/max, but Spark must still OPEN
  * every file footer to use them; over 10k+ files on object storage the
  * footer round-trips dominate a selective range scan. The zone map
  * lifts those stats into ONE small parquet table read in a single
  * request, so a time-range or value-range query opens only the files
  * whose [min,max] interval overlaps the predicate — on range-clustered
  * layouts (`SnapshotTable.compact(clusterBy)`, naturally time-ordered
  * ingest) that is O(matching files). Useless columns cost nothing:
  * pruning is per-column, and an un-clustered column simply admits every
  * file (never wrong, only unhelpful — same contract as any zone map).
  *
  * Build is one distributed pass grouped by `_metadata.file_path`;
  * [[refresh]] appends stats for new files only (ingest-sized IO);
  * lookups existence-check admitted paths so deletions degrade instead
  * of crash (see FileBloomIndex.lookup for the contract rationale).
  */
object FileZoneMap {

  /** One pass: per-file (path, n_rows, min/max per column) → indexDir.
    * Returns the number of indexed files. */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String],
            indexDir: String): Long = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .select((col("_metadata.file_path").as("file_path") +:
        cols.map(col)): _*)
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .write.mode("overwrite").parquet(indexDir)
    spark.read.parquet(indexDir).count()
  }

  /** Append stats for data files not yet indexed (ingest-sized IO);
    * idempotent when nothing is new. */
  def refresh(spark: SparkSession, dataDir: String, cols: Seq[String],
              indexDir: String): Long = {
    import spark.implicits._
    val known = spark.read.parquet(indexDir).select($"file_path")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val fresh = spark.read.parquet(dataDir)
      .select((col("_metadata.file_path").as("file_path") +:
        cols.map(col)): _*)
      .join(broadcast(known), Seq("file_path"), "left_anti")
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val n = fresh.count()
    if (n > 0) {
      val order = spark.read.parquet(indexDir).columns.map(col).toSeq
      fresh.select(order: _*).write.mode("append").parquet(indexDir)
    }
    n
  }

  /** Files whose [min,max] interval for `column` overlaps [lo, hi]. */
  def candidateFiles(spark: SparkSession, indexDir: String, column: String,
                     lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(indexDir)
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select(col("file_path"))
      .collect().map(_.getString(0)).toSeq.sorted

  /** Range scan reading ONLY overlapping files + the exact predicate.
    * Identical to the full-table `WHERE column BETWEEN lo AND hi` while
    * the index is current; stale entries for deleted files are skipped. */
  def rangeLookup(spark: SparkSession, dataDir: String, indexDir: String,
                  column: String, lo: Any, hi: Any): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = candidateFiles(spark, indexDir, column, lo, hi).filter { p =>
      val path = new Path(p)
      path.getFileSystem(hconf).exists(path)
    }
    if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
    else spark.read
      .schema(spark.read.parquet(dataDir).schema)
      // basePath keeps hive-partition columns resolvable when the table
      // is partition-laid-out (without it their values come back null)
      .option("basePath", dataDir)
      .parquet(files: _*)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
