package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level trigram index — the SUBSTRING-predicate member of the
  * file-skipping family ([[FileBloomIndex]] serves equality,
  * [[FileZoneMap]] ranges): `WHERE col LIKE '%needle%'` scans only the
  * files that can possibly contain the needle.
  *
  * Why parquet can't do this alone: footer min/max are useless for
  * infix matches and dictionary filters still open every file. A log/
  * corpus-search engine answers `%needle%` from an n-gram index
  * (Google Code Search's trigram design, Zoekt, Postgres pg_trgm): any
  * row containing `needle` contains every 3-gram of `needle`, so a
  * FILE whose trigram set lacks even one of them can be skipped with
  * zero false negatives. False positives (file has all grams, no row
  * has the contiguous needle) only cost IO and are removed by the
  * exact residual filter.
  *
  * Build is one distributed pass grouped per `_metadata.file_path`
  * (per-file DISTINCT grams — index size is files × per-file gram
  * vocabulary, independent of row count); [[refresh]] appends grams
  * for new files only; lookups existence-check admitted paths so
  * deletions degrade instead of crash (the FileBloomIndex contract).
  * Grams are lowercased, so pruning is case-insensitive-conservative
  * while the residual keeps the caller's exact semantics. Needles
  * shorter than 3 characters have no trigram and cannot prune —
  * [[containsLookup]] falls back to the full scan for them (never
  * wrong, only unhelpful).
  */
object FileTrigramIndex {

  /** Index rows for every data file under `src`: the per-file distinct
    * grams, PLUS one null-gram sentinel per file. The sentinel records
    * "this file was seen" even when every row is too short (or null) to
    * produce a trigram — without it such files would re-enter every
    * [[refresh]] as apparently-new and be re-scanned in full each time.
    * Lookups are unaffected: `isin` never matches a null gram, and a
    * file whose rows are all sub-trigram cannot contain any needle of
    * length ≥ 3, so skipping it stays sound. */
  private def indexRows(src: DataFrame): DataFrame = {
    val grams = src
      .where(length(col("__t")) >= 3)
      .select(col("file_path"),
        explode(array_distinct(transform(sequence(lit(1), length(col("__t")) - 2),
          i => col("__t").substr(i, lit(3))))).as("gram"))
      .distinct()
    val seen = src.select(col("file_path")).distinct()
      .withColumn("gram", lit(null).cast("string"))
    grams.unionByName(seen)
  }

  /** One pass: per-file distinct lowercased trigrams of `column` →
    * (file_path, gram) parquet. Returns the number of indexed files. */
  def build(spark: SparkSession, dataDir: String, column: String,
            indexDir: String): Long = {
    indexRows(spark.read.parquet(dataDir)
        .select(col("_metadata.file_path").as("file_path"),
          lower(col(column)).as("__t")))
      .write.mode("overwrite").parquet(indexDir)
    import spark.implicits._
    spark.read.parquet(indexDir).select($"file_path").distinct().count()
  }

  /** Append grams for data files not yet indexed (ingest-sized IO);
    * idempotent when nothing is new. */
  def refresh(spark: SparkSession, dataDir: String, column: String,
              indexDir: String): Long = {
    import spark.implicits._
    val known = spark.read.parquet(indexDir).select($"file_path").distinct()
    val fresh = indexRows(spark.read.parquet(dataDir)
        .select(col("_metadata.file_path").as("file_path"),
          lower(col(column)).as("__t"))
        .join(broadcast(known), Seq("file_path"), "left_anti"))
      // evaluated twice (count, then write) — pin it once
      .persist()
    try {
      val n = fresh.select($"file_path").distinct().count()
      if (n > 0) fresh.write.mode("append").parquet(indexDir)
      n
    } finally { fresh.unpersist(); () }
  }

  /** Files whose gram set contains EVERY trigram of `needle` — the
    * only files that can hold a `%needle%` match. Sound for any needle
    * of length ≥ 3 (shorter needles: every file is a candidate). */
  def candidateFiles(spark: SparkSession, indexDir: String,
                     needle: String): Seq[String] = {
    val gs = needle.toLowerCase.sliding(3).filter(_.length == 3).toSeq.distinct
    require(gs.nonEmpty,
      s"needle '$needle' is shorter than 3 chars — no trigram to prune on")
    spark.read.parquet(indexDir)
      .filter(col("gram").isin(gs: _*))
      .groupBy(col("file_path"))
      .agg(countDistinct(col("gram")).as("__hits"))
      .filter(col("__hits") === gs.size)
      .select(col("file_path"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** `WHERE contains(column, needle)` reading ONLY candidate files +
    * the exact residual. Identical to the full-table filter while the
    * index is current; stale entries for deleted files are skipped;
    * sub-trigram needles fall back to the full scan. */
  def containsLookup(spark: SparkSession, dataDir: String, indexDir: String,
                     column: String, needle: String): DataFrame = {
    val residual = col(column).contains(needle)
    if (needle.length < 3)
      return spark.read.parquet(dataDir).filter(residual)
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = candidateFiles(spark, indexDir, needle).filter { p =>
      val path = new Path(p)
      path.getFileSystem(hconf).exists(path)
    }
    if (files.isEmpty) spark.read.parquet(dataDir).filter(lit(false))
    else spark.read
      .schema(spark.read.parquet(dataDir).schema)
      .option("basePath", dataDir)
      .parquet(files: _*)
      .filter(residual)
  }
}
