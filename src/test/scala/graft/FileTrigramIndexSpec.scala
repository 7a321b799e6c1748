package graft

import graft.sinks.FileTrigramIndex
import org.apache.spark.sql.functions._

/** Trigram file index: zero false negatives, real file pruning, refresh
  * increments, deletion degrade, sub-trigram fallback. */
class FileTrigramIndexSpec extends SparkSpec {
  import spark.implicits._

  // 16 files; the planted needle lives in exactly 2 of them
  private lazy val (dataDir, idxDir) = {
    val data = tmpDir("trgm-data")
    val idx = tmpDir("trgm-idx")
    val base = (0 until 4000).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta token$i padding")
    }
    val planted = Seq(
      4998L -> "prefix xylophone quartz needle body",
      4999L -> "another xylophone quartz carrier row")
    (base ++ planted).toDF("id", "text")
      .repartition(16, $"id") // planted rows hash into (at most) 2 files
      .write.mode("overwrite").parquet(data)
    FileTrigramIndex.build(spark, data, "text", idx)
    (data, idx)
  }

  test("lookup equals the direct filter; needle files pruned to a handful") {
    val needle = "xylophone quartz"
    val direct = spark.read.parquet(dataDir)
      .filter($"text".contains(needle)).select($"id")
      .collect().map(_.getLong(0)).toSet
    val viaIdx = FileTrigramIndex.containsLookup(
        spark, dataDir, idxDir, "text", needle)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(direct == Set(4998L, 4999L))
    assert(viaIdx == direct)
    val cand = FileTrigramIndex.candidateFiles(spark, idxDir, needle)
    assert(cand.size <= 2, s"needle should prune to <=2/16 files: $cand")
  }

  test("an absent needle admits zero files and an empty (correct) result") {
    assert(FileTrigramIndex.candidateFiles(spark, idxDir, "zzqqxxyy").isEmpty)
    assert(FileTrigramIndex.containsLookup(
      spark, dataDir, idxDir, "text", "zzqqxxyy").count() == 0)
  }

  test("pruning is case-insensitive-conservative; residual stays exact") {
    // the needle exists only lowercase: an uppercase probe must still
    // route through the (lowercased) gram index, then return nothing
    // because contains() is case-sensitive
    val up = FileTrigramIndex.containsLookup(
      spark, dataDir, idxDir, "text", "XYLOPHONE QUARTZ")
    assert(FileTrigramIndex.candidateFiles(
      spark, idxDir, "XYLOPHONE QUARTZ").nonEmpty)
    assert(up.count() == 0)
  }

  test("sub-trigram needles fall back to the full scan, not an error") {
    val two = FileTrigramIndex.containsLookup(
      spark, dataDir, idxDir, "text", "ze")
    assert(two.count() ==
      spark.read.parquet(dataDir).filter($"text".contains("ze")).count())
    intercept[IllegalArgumentException] {
      FileTrigramIndex.candidateFiles(spark, idxDir, "ze")
    }
  }

  test("refresh indexes only new files; lookups see rows from both eras") {
    val data = tmpDir("trgm-data2")
    val idx = tmpDir("trgm-idx2")
    (0L until 100L).map(i => (i, s"first era row$i"))
      .toDF("id", "text").coalesce(2)
      .write.mode("overwrite").parquet(data)
    assert(FileTrigramIndex.build(spark, data, "text", idx) == 2L)
    Seq((200L, "second era jackpot row")).toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(data)
    assert(FileTrigramIndex.refresh(spark, data, "text", idx) == 1L)
    assert(FileTrigramIndex.refresh(spark, data, "text", idx) == 0L)
    assert(FileTrigramIndex.containsLookup(spark, data, idx, "text", "jackpot")
      .select($"id").collect().map(_.getLong(0)).toSet == Set(200L))
    assert(FileTrigramIndex.containsLookup(spark, data, idx, "text", "first era")
      .count() == 100L)
  }

  test("gram-less files are remembered by a sentinel, not re-scanned forever") {
    val data = tmpDir("trgm-data3")
    val idx = tmpDir("trgm-idx3")
    (0L until 50L).map(i => (i, s"normal content row$i"))
      .toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(data)
    // a file whose every row is sub-trigram (or null): no gram can exist
    Seq((100L, "ab"), (101L, "x"), (102L, null.asInstanceOf[String]))
      .toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(data)
    assert(FileTrigramIndex.build(spark, data, "text", idx) == 2L)
    // the gram-less file must NOT look new on refresh — before the
    // sentinel fix it re-entered (and was re-scanned) every time
    assert(FileTrigramIndex.refresh(spark, data, "text", idx) == 0L)
    // soundness: a ≥3-char needle can never live in sub-trigram rows, so
    // skipping the gram-less file keeps lookups exact
    assert(FileTrigramIndex.containsLookup(spark, data, idx, "text", "row4")
      .count() ==
      spark.read.parquet(data).filter($"text".contains("row4")).count())
  }
}
