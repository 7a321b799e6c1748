package graft

import org.apache.spark.sql.functions._

import graft.sinks.FileZoneMap

/** Zone-map pruning: range-clustered layouts admit only overlapping
  * files, results equal the full scan, refresh is ingest-sized, and an
  * un-clustered column degrades to admit-all (never wrong). */
class FileZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val nFiles = 10

  // range-clustered on v: each file holds a disjoint v interval; u is
  // uncorrelated with file layout
  private lazy val (dataDir, indexDir) = {
    val d = tmpDir("zonemap-data")
    val i = tmpDir("zonemap-index")
    (1 to 20000).map(n => (n.toLong, (n * 2654435761L) % 9973L))
      .toDF("v", "u")
      .repartitionByRange(nFiles, $"v")
      .write.mode("overwrite").parquet(d)
    assert(FileZoneMap.build(spark, d, Seq("v", "u"), i) == nFiles)
    (d, i)
  }

  test("clustered-range lookup admits only overlapping files, exact rows") {
    val cand = FileZoneMap.candidateFiles(spark, indexDir, "v", 5000L, 5999L)
    assert(cand.nonEmpty && cand.size <= 2,
      s"admitted ${cand.size} of $nFiles files")
    val got = FileZoneMap
      .rangeLookup(spark, dataDir, indexDir, "v", 5000L, 5999L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (5000L to 5999L))
  }

  test("un-clustered column admits everything but stays correct") {
    val cand = FileZoneMap.candidateFiles(spark, indexDir, "u", 100L, 110L)
    assert(cand.size == nFiles) // no layout help — the honest degradation
    val got = FileZoneMap.rangeLookup(spark, dataDir, indexDir, "u",
      100L, 110L).count()
    val want = spark.read.parquet(dataDir)
      .where($"u" >= 100L && $"u" <= 110L).count()
    assert(got == want)
  }

  test("hive-partitioned layout: partition column survives the pruned read") {
    val d = tmpDir("zonemap-part-data")
    val i = tmpDir("zonemap-part-index")
    (1 to 4000).map(n => (n.toLong, n % 4)).toDF("v", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(d)
    FileZoneMap.build(spark, d, Seq("v"), i)
    val got = FileZoneMap.rangeLookup(spark, d, i, "v", 100L, 110L)
      .select($"v", $"bucket").collect()
    assert(got.length == 11)
    assert(got.forall(r => !r.isNullAt(1)),
      "partition-column values must survive the admitted-files read")
    assert(got.map(r => (r.getLong(0), r.getInt(1))).toSet ==
      (100L to 110L).map(v => (v, (v % 4).toInt)).toSet)
  }

  test("out-of-domain range admits zero files") {
    assert(FileZoneMap.candidateFiles(spark, indexDir, "v",
      900000L, 900010L).isEmpty)
    assert(FileZoneMap.rangeLookup(spark, dataDir, indexDir, "v",
      900000L, 900010L).count() == 0)
  }

  test("refresh indexes only newly ingested files") {
    val d = tmpDir("zonemap-grow")
    val i = tmpDir("zonemap-grow-idx")
    (1 to 1000).map(n => (n.toLong, n.toLong)).toDF("v", "u")
      .repartitionByRange(2, $"v").write.mode("overwrite").parquet(d)
    assert(FileZoneMap.build(spark, d, Seq("v"), i) == 2)
    (100001 to 101000).map(n => (n.toLong, n.toLong)).toDF("v", "u")
      .repartitionByRange(2, $"v").write.mode("append").parquet(d)
    assert(FileZoneMap.refresh(spark, d, Seq("v"), i) == 2)
    assert(FileZoneMap.refresh(spark, d, Seq("v"), i) == 0)
    // only new-generation files overlap (boundary sampling may split the
    // probe range across both of them)
    val cand = FileZoneMap.candidateFiles(spark, i, "v", 100001L, 100500L)
    assert(cand.size <= 2 && cand.nonEmpty)
    assert(FileZoneMap.rangeLookup(spark, d, i, "v", 100001L, 100500L)
      .count() == 500)
  }
}
