package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet's NATIVE per-row-group bloom filters (format ≥ 2.9), written
  * through Spark's parquet options and honored automatically by any
  * bloom-aware reader — Spark's own scans included: with filter pushdown
  * on, parquet-mr consults the bloom before decoding a row group, so an
  * equality probe on a high-NDV column skips row groups whose min/max
  * straddle the probe (the case zone maps can't prune).
  *
  * Relationship to [[FileBloomIndex]]: complementary granularities.
  * FileBloomIndex prunes at FILE level before any scan task launches
  * (driver-side listing cut — the win at 100 TB is not scheduling the
  * tasks at all); the native filter prunes at ROW-GROUP level inside
  * files that survive. Write both for point-lookup-heavy tables.
  *
  * The introspection helpers read footers directly via parquet-mr — they
  * exist so tests and operators can PROVE the structure is present and
  * selective instead of trusting a write option silently ignored. Two
  * silent-absence cases matter (both caught by [[bloomColumns]]):
  *  - a misspelled column in `parquet.bloom.filter.enabled#<col>` is
  *    not an error — the filter just never materializes;
  *  - a chunk that stays FULLY dictionary-encoded (low-NDV column)
  *    drops its bloom by design — the dictionary already answers
  *    membership exactly; set `parquet.enable.dictionary#<col>=false`
  *    to force a bloom there (rarely worth it). */
object NativeParquetBloom {

  /** Writes `df` as parquet with native bloom filters on `cols`.
    * `ndv` sizes the filter (bits ≈ -n·ln(fpp)/ln2²; parquet defaults
    * fpp 1%) — pass the per-ROW-GROUP expected distinct count, not the
    * table-wide one. */
  def write(df: DataFrame, dir: String, cols: Seq[String], ndv: Long,
            partitionBy: Seq[String] = Nil): Unit = {
    require(cols.nonEmpty, "need at least one bloom column")
    val w0 = df.write.mode("overwrite")
    val w = cols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
  }

  private def withReader[A](spark: SparkSession, file: String)
      (f: ParquetFileReader => A): A = {
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try f(r) finally r.close()
  }

  /** Column paths that carry a bloom filter in ANY row group of `file`. */
  def bloomColumns(spark: SparkSession, file: String): Set[String] =
    withReader(spark, file) { r =>
      r.getRowGroups.asScala.flatMap { bl =>
        bl.getColumns.asScala
          .filter(_.getBloomFilterOffset >= 0)
          .map(_.getPath.toDotString)
      }.toSet
    }

  /** Per-row-group bloom verdicts for an equality probe on `col` —
    * `false` means that row group PROVABLY lacks the value (a bloom-
    * aware scan skips it); `true` means "maybe". Longs and strings
    * cover the repo's key types. */
  def mightContain(spark: SparkSession, file: String, col: String,
                   value: Any): Seq[Boolean] =
    withReader(spark, file) { r =>
      r.getRowGroups.asScala.toSeq.map { bl =>
        val cc = bl.getColumns.asScala
          .find(_.getPath.toDotString == col)
          .getOrElse(throw new IllegalArgumentException(
            s"no column $col in $file"))
        val bloom = r.getBloomFilterDataReader(bl).readBloomFilter(cc)
        if (bloom == null) true // no filter => cannot exclude
        else value match {
          case l: Long => bloom.findHash(bloom.hash(l))
          case i: Int => bloom.findHash(bloom.hash(i))
          case s: String =>
            bloom.findHash(bloom.hash(Binary.fromString(s)))
          case d: Double => bloom.findHash(bloom.hash(d))
          case other => throw new IllegalArgumentException(
            s"unsupported probe type: ${other.getClass}")
        }
      }
    }
}
