package graft

import org.apache.spark.sql.functions._

import graft.sinks.FileBloomIndex

/** The file-level bloom index must (a) index every data file, (b) admit
  * only a small fraction of files for a point lookup, (c) return results
  * identical to the full scan, and (d) reject absent keys with (almost
  * always) zero file reads.
  */
class FileBloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private val nFiles = 16

  // hash-partitioned on id: each id lives in exactly one of 16 files,
  // and NO min/max layout could skip for it (ids interleave ranges)
  private lazy val (dataDir, indexDir) = {
    val d = tmpDir("bloomidx-data")
    val i = tmpDir("bloomidx-index")
    (1 to 40000).map(n => (n.toLong, s"payload-$n"))
      .toDF("id", "payload")
      .repartition(nFiles, $"id")
      .write.mode("overwrite").parquet(d)
    val indexed = FileBloomIndex.build(spark, d, "id", i,
      expectedPerFile = 5000L)
    assert(indexed == nFiles)
    (d, i)
  }

  test("point lookup admits few files and matches the full scan") {
    val present = Seq(17L, 4242L, 39999L)
    present.foreach { id =>
      val cand = FileBloomIndex.candidateFiles(spark, indexDir, id)
      assert(cand.nonEmpty && cand.size <= 3,
        s"id=$id admitted ${cand.size} of $nFiles files")
      val got = FileBloomIndex.lookup(spark, dataDir, indexDir, "id", id)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = spark.read.parquet(dataDir).where($"id" === id)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.size == 1)
    }
  }

  test("probe type widening: Int probe on a LONG-indexed column still hits") {
    // the id column is LONG; an Int-typed probe must hash identically to
    // the plain filter's implicit cast, not silently admit zero files
    val cand = FileBloomIndex.lookup(spark, dataDir, indexDir, "id", 4242)
      .collect()
    assert(cand.length == 1 && cand.head.getLong(0) == 4242L)
  }

  test("hive-partitioned layout: partition column survives the pruned read") {
    val d = tmpDir("bloomidx-part-data")
    val i = tmpDir("bloomidx-part-index")
    (1 to 4000).map(n => (n.toLong, s"pl-$n", n % 4))
      .toDF("id", "payload", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(d)
    FileBloomIndex.build(spark, d, "id", i, expectedPerFile = 2000L)
    val got = FileBloomIndex.lookup(spark, d, i, "id", 1234L)
      .select($"id", $"payload", $"bucket").collect()
    assert(got.length == 1, "exactly one row for the key")
    assert(!got.head.isNullAt(2) && got.head.getInt(2) == (1234 % 4),
      "partition-column value must survive the admitted-files read")
  }

  test("absent keys are rejected by the index alone") {
    // 100 absent keys: expect ~fpp·nFiles·100 ≈ 16 false admissions max;
    // every lookup result must still be empty
    val absent = (1000001L to 1000100L)
    val admitted = absent.map(id =>
      FileBloomIndex.candidateFiles(spark, indexDir, id).size).sum
    assert(admitted <= 32, s"$admitted false admissions across 100 keys")
    assert(FileBloomIndex.lookup(spark, dataDir, indexDir, "id", 1000001L)
      .count() == 0)
  }

  test("refresh indexes only new files and keeps lookups exact") {
    val d = tmpDir("bloomidx-grow-data")
    val i = tmpDir("bloomidx-grow-index")
    (1 to 8000).map(n => (n.toLong, s"p$n")).toDF("id", "payload")
      .repartition(4, $"id").write.mode("overwrite").parquet(d)
    assert(FileBloomIndex.build(spark, d, "id", i, 5000L) == 4)
    // a second ingest batch lands as new files with NEW keys
    (100001 to 108000).map(n => (n.toLong, s"p$n")).toDF("id", "payload")
      .repartition(4, $"id").write.mode("append").parquet(d)
    assert(FileBloomIndex.refresh(spark, d, "id", i, 5000L) == 4)
    assert(FileBloomIndex.refresh(spark, d, "id", i, 5000L) == 0) // idempotent
    assert(spark.read.parquet(i).count() == 8)
    // keys from both generations resolve; old files are not re-read for
    // new-generation keys
    Seq(42L, 100042L).foreach { id =>
      val got = FileBloomIndex.lookup(spark, d, i, "id", id).count()
      assert(got == 1, s"id=$id")
      assert(FileBloomIndex.candidateFiles(spark, i, id).size <= 2)
    }
  }

  test("stale index rows for deleted files do not break lookups") {
    val d = tmpDir("bloomidx-stale-data")
    val i = tmpDir("bloomidx-stale-index")
    (1 to 4000).map(n => (n.toLong, s"p$n")).toDF("id", "payload")
      .repartition(4, $"id").write.mode("overwrite").parquet(d)
    FileBloomIndex.build(spark, d, "id", i, 5000L)
    // simulate a retention/compaction pass deleting one data file
    val victim = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val survivors = spark.read.parquet(d)
      .where(not(col("_metadata.file_path").contains(victim.getName)))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(victim.delete())
    // a key in a surviving file still resolves; a key that lived only in
    // the deleted file returns empty instead of throwing
    val present = survivors.head
    assert(FileBloomIndex.lookup(spark, d, i, "id", present).count() == 1)
    val gone = (1L to 4000L).find(!survivors.contains(_)).get
    assert(FileBloomIndex.lookup(spark, d, i, "id", gone).count() == 0)
  }

  test("index rows carry true per-file row counts") {
    val total = spark.read.parquet(indexDir)
      .agg(sum($"n_rows")).head().getLong(0)
    assert(total == 40000L)
  }
}
