package graft.sinks

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.ops.BloomOps

/** File-level bloom-filter index — point-lookup data skipping for
  * columns that clustering can't serve.
  *
  * Z-order/cluster-by compaction gives min/max file skipping on the
  * layout keys, but a point lookup on any OTHER high-cardinality column
  * (a doc_id, a user key, a fingerprint) still scans every file. This
  * index stores one bloom sketch of `keyCol` PER DATA FILE; a lookup
  * consults the index first and reads only the files whose sketch
  * admits the key — at a 10k-file table that is 1–2 file reads instead
  * of 10k (bounded below by the fpp). The same idea ships as Delta's
  * bloom-filter index and ORC's bloom stream; this is the engine-level
  * form over plain parquet.
  *
  * Scale shape: the index build is one distributed pass grouped by
  * `_metadata.file_path` (no driver materialization — sketches are
  * OR-merged map-side); a lookup scans the INDEX distributed, and only
  * the few admitted file paths (strings) reach the driver. Sketch size
  * is `expectedPerFile`-tuned: 100k keys at 1% fpp ≈ 120 KB per file —
  * index bytes are ~0.1% of data bytes.
  */
object FileBloomIndex {

  /** One pass over `dataDir`: per-file (path, row count, bloom sketch)
    * written to `indexDir`. Returns the number of indexed files. */
  def build(spark: SparkSession, dataDir: String, keyCol: String,
            indexDir: String, expectedPerFile: Long = 100000L,
            fpp: Double = 0.01): Long = {
    val perFile = spark.read.parquet(dataDir)
      .select(col(keyCol), col("_metadata.file_path").as("file_path"))
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"),
        BloomOps.bloomAgg(col(keyCol), expectedPerFile, fpp).as("bloom"))
    perFile.write.mode("overwrite").parquet(indexDir)
    spark.read.parquet(indexDir).count()
  }

  /** Incremental maintenance: index ONLY the data files not yet present
    * in the index and append their sketch rows — per-refresh IO is
    * proportional to the new files, never the table (the same
    * append-only contract as the fingerprint and sketch stores).
    * Returns the number of newly indexed files. */
  def refresh(spark: SparkSession, dataDir: String, keyCol: String,
              indexDir: String, expectedPerFile: Long = 100000L,
              fpp: Double = 0.01): Long = {
    import spark.implicits._
    val known = spark.read.parquet(indexDir).select($"file_path")
    val fresh = spark.read.parquet(dataDir)
      .select(col(keyCol), col("_metadata.file_path").as("file_path"))
      .join(broadcast(known), Seq("file_path"), "left_anti")
    val newRows = fresh
      .groupBy($"file_path")
      .agg(count(lit(1)).as("n_rows"),
        BloomOps.bloomAgg(col(keyCol), expectedPerFile, fpp).as("bloom"))
    val n = newRows.count()
    if (n > 0) {
      // align column order with the existing index before appending
      val cols = spark.read.parquet(indexDir).columns.map(col).toSeq
      newRows.select(cols: _*).write.mode("append").parquet(indexDir)
    }
    n
  }

  /** Files whose sketch admits `value` — the skip decision, exposed for
    * tests and for composing with other pruning. Distributed index scan;
    * only admitted paths are collected. Pass `keyType` (the indexed
    * column's Spark type) when the probe's Scala type may differ — the
    * probe is cast before hashing, matching the plain filter's implicit
    * cast ([[lookup]] resolves it from the data schema automatically). */
  def candidateFiles(spark: SparkSession, indexDir: String,
                     value: Any,
                     keyType: Option[org.apache.spark.sql.types.DataType] = None)
      : Seq[String] = {
    import spark.implicits._
    val hashed = BloomOps.hashLookupValue(value, keyType)
    spark.read.parquet(indexDir)
      .select($"file_path", $"bloom").as[(String, Array[Byte])]
      .mapPartitions(_.collect {
        case (path, bloom)
          if BloomFilter.readFrom(new ByteArrayInputStream(bloom))
            .mightContainLong(hashed) => path
      })
      .collect().toSeq.sorted
  }

  /** Point lookup: read ONLY the admitted files, then apply the exact
    * predicate (killing bloom false positives). Result is identical to
    * `spark.read.parquet(dataDir).filter(keyCol === value)` as long as
    * the index is current ([[refresh]] after ingest; [[build]] after a
    * compaction that REWRITES files). Stale rows for deleted files are
    * tolerated: admitted paths are existence-checked (a few driver-side
    * stats on an already-small list) rather than crashing the scan —
    * but rows moved into NOT-yet-indexed files are invisible until the
    * next refresh, the standard secondary-index contract. */
  def lookup(spark: SparkSession, dataDir: String, indexDir: String,
             keyCol: String, value: Any): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dataSchema = spark.read.parquet(dataDir).schema
    val keyType = dataSchema.fields.find(_.name == keyCol).map(_.dataType)
    val files = candidateFiles(spark, indexDir, value, keyType).filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(hconf).exists(path)
    }
    if (files.isEmpty) {
      spark.read.parquet(dataDir).filter(lit(false))
    } else {
      // basePath keeps hive-partition columns resolvable when the table
      // is partition-laid-out (without it their values come back null)
      spark.read
        .schema(dataSchema)
        .option("basePath", dataDir)
        .parquet(files: _*)
        .filter(col(keyCol) === lit(value))
    }
  }
}
