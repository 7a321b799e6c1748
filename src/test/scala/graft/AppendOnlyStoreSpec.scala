package graft

import graft.sinks.AppendOnlyStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The store's per-prefix INCREMENTAL compaction contract: only
  * prefixes holding more than `maxFilesUntouched` files are folded
  * through the cluster; untouched prefix directories move into the new
  * generation as verbatim storage-layer copies (byte-identical files),
  * and a fully-compact store no-ops. Result-invariance throughout. */
class AppendOnlyStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fileHashes(store: AppendOnlyStore): Map[String, String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    store.dataFiles().map { f =>
      val p = new Path(f)
      val in = fs.open(p)
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); in.close()
      // key on prefix-dir/file-name (generation dirs differ across
      // compactions by design — the FILES must carry over bit-identical)
      s"${p.getParent.getName}/${p.getName}" ->
        java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
    }.toMap
  }

  private def contents(store: AppendOnlyStore): Map[(String, Long), Long] =
    store.read().groupBy($"fingerprint", $"v")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("per-prefix compaction folds only multi-file prefixes; copies are byte-identical") {
    val store = new AppendOnlyStore(spark, tmpDir("aos"), prefixChars = 1)
    // seed every prefix with one batch, then compact to 1 file/prefix
    val seed = (0 until 64).map(i => (f"$i%02x-key-$i", i.toLong))
      .toDF("fingerprint", "v")
    store.append(seed)
    store.append(seed.withColumn("v", $"v" + 1000))
    store.compactWith(identity(_))
    val before = contents(store)
    val filesBefore = fileHashes(store)
    // touch ONLY prefixes '0' and '1' with a narrow append
    val narrow = Seq(("0a-late", 1L), ("1b-late", 2L)).toDF("fingerprint", "v")
    store.append(narrow)
    store.compactWith(identity(_))
    val filesAfter = fileHashes(store)
    // untouched prefixes: every file carried over byte-identical
    val untouched = filesBefore.filter { case (k, _) =>
      !k.startsWith("prefix=0/") && !k.startsWith("prefix=1/") }
    assert(untouched.nonEmpty)
    untouched.foreach { case (k, h) =>
      assert(filesAfter.get(k).contains(h),
        s"untouched $k was rewritten (or dropped) by per-prefix compaction")
    }
    // touched prefixes really folded back to one file each
    assert(filesAfter.keys.count(_.startsWith("prefix=0/")) == 1)
    assert(filesAfter.keys.count(_.startsWith("prefix=1/")) == 1)
    // and the store's contents are exactly before + the narrow batch
    val want = before ++ Map(("0a-late", 1L) -> 1L, ("1b-late", 2L) -> 1L)
    assert(contents(store) == want)
  }

  test("a fully-compact store no-ops: same generation, same files") {
    val store = new AppendOnlyStore(spark, tmpDir("aos"), prefixChars = 1)
    store.append((0 until 32).map(i => (f"$i%02x-k", i.toLong))
      .toDF("fingerprint", "v"))
    store.compactWith(identity(_))
    val files = store.dataFiles().toSet
    store.compactWith(identity(_)) // nothing above the threshold
    assert(store.dataFiles().toSet == files,
      "no-op compaction must not publish a new generation")
  }

  test("a fully-retracted store compacts to zero files yet stays readable") {
    val store = new AppendOnlyStore(spark, tmpDir("aos"), prefixChars = 1)
    store.append(Seq(("aa-k", 1L), ("ab-k", -1L)).toDF("fingerprint", "v"))
    store.append(Seq(("aa-k", 2L)).toDF("fingerprint", "v")) // 2 files → dirty
    // a fold that nets everything away (the signed-IVM full-takedown
    // shape — q186 at sf0.001 wiped every nation's multiset this way)
    store.compactWith(df => df.filter(org.apache.spark.sql.functions
      .col("v") > 100L))
    assert(store.dataFiles().isEmpty && !store.exists)
    val empty = store.read() // must NOT throw UNABLE_TO_INFER_SCHEMA
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("fingerprint", "v", "prefix"))
    // and the store keeps working: a later append revives it
    store.append(Seq(("ac-k", 3L)).toDF("fingerprint", "v"))
    assert(contents(store) == Map(("ac-k", 3L) -> 1L))
  }

  test("the fold still sees and shrinks every multi-file prefix's rows") {
    val store = new AppendOnlyStore(spark, tmpDir("aos"), prefixChars = 1)
    val b = Seq(("aa-k", 1L), ("aa-k", 1L), ("ab-k", 2L)).toDF("fingerprint", "v")
    store.append(b)
    store.append(b) // prefix 'a': 2 files, 6 rows with duplicates
    store.compactWith(_.dropDuplicates("fingerprint", "v"))
    assert(contents(store) == Map(("aa-k", 1L) -> 1L, ("ab-k", 2L) -> 1L))
  }
}
