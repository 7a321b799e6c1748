package graft

import graft.ops.IncrementalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiset delta-join IVM vs the one-shot join, under batch
  * interleavings, duplicate rows, crash replays, and compactions. */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "lv")
  private def rightDf(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "rv")

  private def multiset(df: DataFrame): Set[(Long, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSet

  private def currentSet(st: IncrementalJoin.Stores) =
    multiset(IncrementalJoin.current(st).select($"k", $"lv", $"rv", $"n"))

  private def oneShot(l: DataFrame, r: DataFrame) =
    multiset(l.join(r, Seq("k"))
      .groupBy($"k", $"lv", $"rv").agg(count(lit(1)).as("n"))
      .select($"k", $"lv", $"rv", $"n"))

  test("interleaved appends on both sides equal the one-shot join") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    val l1 = leftDf(1L -> "a", 2L -> "b")
    val r1 = rightDf(1L -> "x", 3L -> "y")
    val l2 = leftDf(3L -> "c", 1L -> "d")
    val r2 = rightDf(2L -> "z", 1L -> "w")
    IncrementalJoin.appendLeft(st, l1, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r1, Seq("k"), 10L)
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    IncrementalJoin.appendRight(st, r2, Seq("k"), 11L)
    assert(currentSet(st) ==
      oneShot(l1.unionByName(l2), r1.unionByName(r2)))
  }

  test("duplicate rows multiply: multiplicities are exact products") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    val l = leftDf(1L -> "a", 1L -> "a", 1L -> "a") // same row ×3
    val r = rightDf(1L -> "x", 1L -> "x")           // same row ×2
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L)
    assert(currentSet(st) == Set((1L, "a", "x", 6L)))
  }

  test("crash-replayed batches change nothing (exactly-once)") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    val l = leftDf(1L -> "a", 2L -> "b")
    val r = rightDf(1L -> "x", 2L -> "y")
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L)
    val before = currentSet(st)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L) // replay
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)   // replay
    assert(currentSet(st) == before)
    assert(before == oneShot(l, r))
  }

  test("compactions are result-invariant and shrink the stores") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    val ls = (0 until 4).map(i => leftDf((1L to 5L).map(k => k -> s"l$i"): _*))
    val rs = (0 until 4).map(i => rightDf((1L to 5L).map(k => k -> s"r$i"): _*))
    ls.zipWithIndex.foreach { case (b, i) =>
      IncrementalJoin.appendLeft(st, b, Seq("k"), i.toLong)
      IncrementalJoin.appendRight(st, rs(i), Seq("k"), 100L + i)
    }
    val before = currentSet(st)
    val filesBefore = st.out.dataFiles().size
    IncrementalJoin.compactOut(st)
    IncrementalJoin.compactSides(st, Seq("k"))
    assert(currentSet(st) == before)
    assert(st.out.dataFiles().size <= filesBefore)
    // appends continue working after compaction
    val l5 = leftDf(5L -> "late")
    IncrementalJoin.appendLeft(st, l5, Seq("k"), 50L)
    assert(currentSet(st) ==
      oneShot(ls.reduce(_ unionByName _).unionByName(l5),
        rs.reduce(_ unionByName _)))
  }

  test("per-bucket compaction leaves untouched buckets' files byte-identical") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    def hashes(spark: org.apache.spark.sql.SparkSession, table: String)
        : Map[String, String] = {
      val loc = new Path(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(loc, true)
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && !f.getPath.getName.startsWith("_")) {
          val in = fs.open(f.getPath)
          val bytes = new Array[Byte](f.getLen.toInt)
          in.readFully(bytes); in.close()
          b += f.getPath.toString ->
            java.security.MessageDigest.getInstance("MD5")
              .digest(bytes).map("%02x".format(_)).mkString
        }
      }
      b.result()
    }
    def bucketOf(path: String): String =
      "__bg=(\\d+)".r.findFirstMatchIn(path).map(_.group(1)).getOrElse("?")

    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"), buckets = 8)
    val l1 = leftDf((1L to 40L).map(k => k -> s"l$k"): _*)
    val r1 = rightDf((1L to 40L).map(k => k -> s"r$k"): _*)
    IncrementalJoin.appendLeft(st, l1, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r1, Seq("k"), 10L)
    IncrementalJoin.compactSides(st, Seq("k")) // everything folded once
    // one narrow batch: only the buckets holding k=1's hash gain debt
    val l2 = leftDf(1L -> "late")
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    val touched = spark.table(st.leftTable)
      .filter(col("__bid") =!= Long.MinValue)
      .select(col("__bg")).distinct().collect()
      .map(_.getInt(0).toString).toSet
    assert(touched.nonEmpty && touched.size < 8,
      s"test premise: the narrow batch must touch a strict subset, got $touched")
    val before = currentSet(st)
    val leftBefore = hashes(spark, st.leftTable)
    val rightBefore = hashes(spark, st.rightTable)
    IncrementalJoin.compactSides(st, Seq("k"))
    val leftAfter = hashes(spark, st.leftTable)
    // untouched left buckets: every pre-compaction file survives byte-identical
    leftBefore.filter { case (p, _) => !touched.contains(bucketOf(p)) }
      .foreach { case (p, h) =>
        assert(leftAfter.get(p).contains(h),
          s"untouched bucket file $p was rewritten by per-bucket compaction")
      }
    // the RIGHT side had no debt at all: zero files rewritten
    assert(hashes(spark, st.rightTable) == rightBefore)
    // touched buckets really were folded (their old files are gone)
    assert(leftBefore.keys.exists(p =>
      touched.contains(bucketOf(p)) && !leftAfter.contains(p)))
    // and the fold is result-invariant, with appends continuing after it
    assert(currentSet(st) == before)
    IncrementalJoin.appendLeft(st, leftDf(2L -> "post"), Seq("k"), 2L)
    assert(currentSet(st) == oneShot(
      l1.unionByName(l2).unionByName(leftDf(2L -> "post")), r1))
  }

  test("reading before both sides have data is refused") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    IncrementalJoin.appendLeft(st, leftDf(1L -> "a"), Seq("k"), 0L)
    intercept[IllegalStateException] { IncrementalJoin.current(st) }
  }

  test("replays are no-ops on BOTH sides of a compaction (manifest, not stamps)") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    val l = leftDf(1L -> "a")
    val r = rightDf(1L -> "x")
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L)
    IncrementalJoin.compactOut(st)
    // post-compaction batch replays exactly-once
    val l2 = leftDf(1L -> "b")
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    assert(currentSet(st) == oneShot(l.unionByName(l2), r))
    // a PRE-compaction batch's output stamps were collapsed away, but the
    // applied-batch-id manifest outlives compaction: the replay is an
    // append-time no-op, never a double-count (the pre-manifest design
    // documented this exact case as its replay-safety boundary)
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    val over = IncrementalJoin.current(st)
      .where(col("lv") === "a").select(col("n"))
      .collect()(0).getLong(0)
    assert(over == 1L)
  }

  test("a retry after a mid-write crash dedups via the dirty flag until compaction") {
    val root = tmpDir("ijoin")
    val st = IncrementalJoin.stores(spark, root)
    val l = leftDf(1L -> "a", 2L -> "b")
    val r = rightDf(1L -> "x", 2L -> "y")
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L)
    // simulate batch 1 crashing between its .started marker and .done:
    // the side table holds the batch's rows but the manifest never
    // committed it — exactly the partial-write window
    val l2 = leftDf(1L -> "c")
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(root, "_applied/left.1.done"), false))
    // the retry re-appends batch 1's rows (side now holds them twice) and
    // must flag the side dirty so state reads dedup
    IncrementalJoin.appendLeft(st, l2, Seq("k"), 1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_applied/left.dirty")))
    // a later RIGHT delta joins against the dirty left state: the dedup
    // must keep the retried batch single-counted
    val r2 = rightDf(1L -> "z")
    IncrementalJoin.appendRight(st, r2, Seq("k"), 11L)
    assert(currentSet(st) ==
      oneShot(l.unionByName(l2), r.unionByName(r2)))
    // side compaction rewrites from the deduped fold and clears the flag
    IncrementalJoin.compactSides(st, Seq("k"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_applied/left.dirty")))
    assert(currentSet(st) ==
      oneShot(l.unionByName(l2), r.unionByName(r2)))
  }

  test("a dirty sweep truncates net-zero buckets so retry duplicates cannot outlive the flag") {
    // the r8-ADVICE hazard: a target bucket whose compaction fold nets
    // to ZERO rows never appears in the dynamic-overwrite output, so its
    // crash-retry duplicate partials used to survive the sweep — and
    // once the dirty flag cleared, sideState stopped deduplicating and
    // every later delta join double-counted the retraction
    val root = tmpDir("ijoin")
    val st = IncrementalJoin.stores(spark, root)
    IncrementalJoin.appendLeft(st, leftDf(1L -> "a"), Seq("k"), 0L)
    IncrementalJoin.appendRight(st, rightDf(1L -> "x"), Seq("k"), 10L)
    // batch 1 retracts the only left row — its bucket now nets to zero
    val retract = Seq((1L, "a", -1L)).toDF("k", "lv", "__delta")
    IncrementalJoin.appendLeftDelta(st, retract, Seq("k"), 1L)
    // simulate a mid-write crash + retry: the fold row lands twice and
    // the side goes dirty
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(root, "_applied/left.1.done"), false))
    IncrementalJoin.appendLeftDelta(st, retract, Seq("k"), 1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_applied/left.dirty")))
    assert(currentSet(st).isEmpty) // dirty dedup keeps the state exact
    IncrementalJoin.compactSides(st, Seq("k"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_applied/left.dirty")))
    // the net-zero bucket must be physically empty — no surviving
    // duplicate partial rows now that reads no longer dedup
    assert(spark.table(st.leftTable).count() == 0,
      "net-zero bucket kept stale rows past the dirty sweep")
    // and a post-compaction delta join must not resurrect the retraction
    IncrementalJoin.appendRight(st, rightDf(1L -> "z"), Seq("k"), 11L)
    assert(currentSet(st).isEmpty)
  }

  test("disjoint key sets give an EMPTY join with the right schema, not an error") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    IncrementalJoin.appendLeft(st, leftDf(1L -> "a"), Seq("k"), 0L)
    IncrementalJoin.appendRight(st, rightDf(2L -> "x"), Seq("k"), 10L)
    val out = IncrementalJoin.current(st)
    assert(out.columns.toSet == Set("k", "lv", "rv", "n"))
    assert(out.count() == 0)
  }

  test("compactSides publishes optimizer statistics for the state tables") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    IncrementalJoin.appendLeft(st, leftDf((1L to 50L).map(k => k -> s"l$k"): _*),
      Seq("k"), 0L)
    IncrementalJoin.appendRight(st, rightDf((1L to 50L).map(k => k -> s"r$k"): _*),
      Seq("k"), 10L)
    // before compaction the catalog has no ANALYZE stats: row counts are
    // invisible in every mode (size alone is file-derived)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try assert(graft.catalog.TableStats.rowCount(spark, st.leftTable).isEmpty)
    finally spark.conf.set("spark.sql.cbo.enabled", "false")
    IncrementalJoin.compactSides(st, Seq("k"))
    // after: real size + CBO-visible row count and key NDVs …
    assert(graft.catalog.TableStats.sizeInBytes(spark, st.leftTable) <
      1000000L)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try assert(graft.catalog.TableStats.rowCount(spark, st.leftTable)
      .contains(BigInt(50)))
    finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // … so a join of maintained state against a big frame picks a
    // BROADCAST of the state from stats alone — no hint anywhere
    val big = spark.range(0, 100000).select(col("id").as("k"))
    val joined = big.join(spark.table(st.leftTable).drop("__bid", "__mult"),
      Seq("k"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"expected a stats-driven broadcast in:\n$phys")
  }

  test("keys appearing on only one side never reach the output") {
    val st = IncrementalJoin.stores(spark, tmpDir("ijoin"))
    IncrementalJoin.appendLeft(st, leftDf(1L -> "a", 9L -> "only-left"), Seq("k"), 0L)
    IncrementalJoin.appendRight(st, rightDf(1L -> "x", 8L -> "only-right"), Seq("k"), 10L)
    assert(currentSet(st) == Set((1L, "a", "x", 1L)))
  }
}
