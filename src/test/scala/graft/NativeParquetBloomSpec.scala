package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.NativeParquetBloom

/** Native parquet bloom filters: prove the structure is WRITTEN (footer
  * offsets), SELECTIVE (absent probes excluded in every row group), and
  * SEMANTICALLY FREE (identical query results with and without). The
  * row-group-skip behavior itself is parquet-mr's, driven by the same
  * findHash the spec exercises directly. */
class NativeParquetBloomSpec extends SparkSpec {
  import spark.implicits._

  // values interleave so every row group's [min,max] covers every probe —
  // the regime where zone maps are useless and ONLY a bloom can skip.
  // uid is high-NDV (unique per row): see the dictionary-interaction test
  private def table(n: Int) = (1 to n)
    .map(i => ((i.toLong * 2654435761L) % 1000003L, s"k${i % 97}",
      f"uid-${(i * 48271) % n}%08d", i.toLong))
    .toDF("key", "cat", "uid", "seq")

  private def oneParquetFile(dir: String): String =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head.getAbsolutePath

  test("bloom filters materialize on the requested high-NDV columns") {
    val dir = Files.createTempDirectory("npb").toString
    NativeParquetBloom.write(table(5000).coalesce(1), dir,
      cols = Seq("key", "uid"), ndv = 10000)
    val f = oneParquetFile(dir)
    assert(NativeParquetBloom.bloomColumns(spark, f) == Set("key", "uid"))

    val plainDir = Files.createTempDirectory("npb").toString
    table(5000).coalesce(1).write.mode("overwrite").parquet(plainDir)
    assert(NativeParquetBloom.bloomColumns(
      spark, oneParquetFile(plainDir)).isEmpty)
  }

  test("fully-dictionary-encoded low-NDV column drops its bloom (by design)") {
    // parquet-mr omits the bloom when the chunk stays entirely
    // dictionary-encoded — the dictionary already answers membership
    // exactly. Disabling dictionary for the column forces the bloom.
    // The introspection makes this visible instead of silently absent.
    val dir = Files.createTempDirectory("npb").toString
    NativeParquetBloom.write(table(5000).coalesce(1), dir,
      cols = Seq("cat"), ndv = 100)
    assert(NativeParquetBloom.bloomColumns(
      spark, oneParquetFile(dir)).isEmpty)

    val dir2 = Files.createTempDirectory("npb").toString
    table(5000).coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#cat", "true")
      .option("parquet.bloom.filter.expected.ndv#cat", "100")
      .option("parquet.enable.dictionary#cat", "false")
      .parquet(dir2)
    assert(NativeParquetBloom.bloomColumns(
      spark, oneParquetFile(dir2)) == Set("cat"))
  }

  test("a misspelled bloom column is silently absent — the introspection catches it") {
    val dir = Files.createTempDirectory("npb").toString
    NativeParquetBloom.write(table(1000).coalesce(1), dir,
      cols = Seq("no_such_col"), ndv = 1000)
    assert(NativeParquetBloom.bloomColumns(
      spark, oneParquetFile(dir)).isEmpty)
  }

  test("absent probe is excluded by EVERY row group; present probe survives") {
    val dir = Files.createTempDirectory("npb").toString
    // small block size forces multiple row groups in one file
    table(200000).coalesce(1)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#key", "true")
      .option("parquet.bloom.filter.expected.ndv#key", "100000")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(dir)
    val f = oneParquetFile(dir)
    val groups = NativeParquetBloom.mightContain(spark, f, "key", -99L)
    assert(groups.length >= 3, s"expected several row groups, got $groups")
    assert(groups.forall(_ == false),
      "a value never written must be excluded by every row group's bloom")
    val present = table(200000)
      .select($"key").head().getLong(0)
    val hits = NativeParquetBloom.mightContain(spark, f, "key", present)
    assert(hits.contains(true), "a present value must survive somewhere")
  }

  test("string-key probes work and results are identical with/without bloom") {
    val dirB = Files.createTempDirectory("npb").toString
    val dirP = Files.createTempDirectory("npb").toString
    NativeParquetBloom.write(table(20000), dirB, Seq("uid"), ndv = 20000)
    table(20000).write.mode("overwrite").parquet(dirP)
    val qB = spark.read.parquet(dirB).where($"uid" === "uid-00000042")
      .agg(count(lit(1)), sum($"seq")).collect().toSeq
    val qP = spark.read.parquet(dirP).where($"uid" === "uid-00000042")
      .agg(count(lit(1)), sum($"seq")).collect().toSeq
    assert(qB.toString == qP.toString)
    val f = oneParquetFile(dirB)
    assert(NativeParquetBloom.mightContain(spark, f, "uid", "zzz-absent")
      .forall(_ == false))
  }
}
