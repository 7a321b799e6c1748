package graft

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  test("overwrite + read round-trip, versions advance") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t1")
    assert(!t.exists)
    val v1 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(v1 == 1 && t.read().count() == 2)
    val v2 = t.overwrite(Seq((3, "c")).toDF("id", "v"))
    assert(v2 == 2 && t.read().count() == 1)
    assert(t.readVersion(1).count() == 2) // time travel
  }

  test("merge upserts latest-per-key; updates beat existing on order ties") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t2")
    t.overwrite(Seq((1, "old", 10L), (2, "keep", 10L)).toDF("id", "v", "ts"))
    t.merge(Seq((1, "new", 20L), (3, "ins", 5L)).toDF("id", "v", "ts"),
      keys = Seq("id"), orderCols = Seq(col("ts")))
    val got = t.read().orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "new"), (2, "keep"), (3, "ins")))
    // tie on ts: update wins over existing
    t.merge(Seq((2, "tie-upd", 10L)).toDF("id", "v", "ts"),
      keys = Seq("id"), orderCols = Seq(col("ts")))
    assert(t.read().filter($"id" === 2).head().getString(1) == "tie-upd")
  }

  test("merge is idempotent") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t3")
    val upd = Seq((1, "x", 1L), (2, "y", 2L)).toDF("id", "v", "ts")
    t.merge(upd, Seq("id"), Seq(col("ts")))
    val first = t.read().orderBy("id").collect().toSeq
    t.merge(upd, Seq("id"), Seq(col("ts")))
    assert(t.read().orderBy("id").collect().toSeq == first)
  }

  test("WAP: failed audit does not publish; reader still sees old version") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t4")
    t.overwrite(Seq((1, "good", 0L)).toDF("id", "v", "ts"))
    val r = t.mergeAudited(Seq((1, "bad", 1L)).toDF("id", "v", "ts"),
      keys = Seq("id"), orderCols = Seq(col("ts")),
      audit = df => df.filter($"v" === "bad").isEmpty)
    assert(r.isEmpty)
    assert(t.read().head().getString(1) == "good")
  }

  test("a reader pinned to an old snapshot survives a concurrent publish") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/iso")
    t.overwrite(Seq((1, "old")).toDF("id", "v"))
    val pinned = t.read() // plan captured against snapshot=1 files
    t.overwrite(Seq((2, "new")).toDF("id", "v"))
    // snapshot immutability: the pinned frame still reads v1's files
    assert(pinned.collect().map(_.getString(1)).toSeq == Seq("old"))
    assert(t.read().head().getString(1) == "new")
  }

  test("publish is atomic: a concurrent reader never sees a missing pointer") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/atomic")
    // stage two snapshots once, then flip the pointer between them rapidly
    val v1 = t.stage(Seq((1, "a")).toDF("id", "v"))
    t.publish(v1)
    val v2 = t.stage(Seq((2, "b")).toDF("id", "v"))
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val v = t.latestVersion
          if (v.isEmpty) failures.incrementAndGet()
          else t.readVersion(v.get) // plan build resolves snapshot dir
        } catch { case _: Exception => failures.incrementAndGet() }
      }
    })
    reader.start()
    (1 to 200).foreach { i => t.publish(if (i % 2 == 0) v1 else v2) }
    stop = true
    reader.join()
    assert(failures.get() == 0,
      s"${failures.get()} reads observed a missing/broken pointer during publishes")
    assert(t.latestVersion.contains(v1))
    // rollback (publish of an older version) still wins over max-version
    t.publish(v2); t.rollback(v1)
    assert(t.latestVersion.contains(v1))
  }

  test("partitioned write + vacuum keeps only latest snapshot") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t5")
    t.overwrite(Seq((1, "a", "2024-01-01"), (2, "b", "2024-01-02"))
      .toDF("id", "v", "d"), partitionBy = Seq("d"))
    t.overwrite(Seq((3, "c", "2024-01-03")).toDF("id", "v", "d"), partitionBy = Seq("d"))
    t.vacuum()
    assert(t.read().count() == 1)
    intercept[Exception] { t.readVersion(1).count() }
  }

  test("mergeInPlaceByPartition rewrites only affected partitions") {
    val t = new SnapshotTable(spark, tmpDir("snap") + "/t6")
    t.mergeInPlaceByPartition(
      Seq((1, "a", 1L, "2024-01-01"), (2, "b", 1L, "2024-01-02"))
        .toDF("id", "v", "ts", "d"),
      Seq("id"), Seq(col("ts")), "d")
    t.mergeInPlaceByPartition(
      Seq((1, "a2", 2L, "2024-01-01"), (3, "c", 1L, "2024-01-03"))
        .toDF("id", "v", "ts", "d"),
      Seq("id"), Seq(col("ts")), "d")
    val got = t.readInPlace().orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a2"), (2, "b"), (3, "c")))
  }

  test("history lists every retained snapshot incl. staged-only, flags current") {
    val t = new SnapshotTable(spark, tmpDir("hist"))
    t.overwrite(Seq((1, "a")).toDF("id", "v"))        // v1 published
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v")) // v2 published
    t.stage(Seq((9, "z")).toDF("id", "v"))            // v3 staged, unpublished
    val h = t.history().orderBy("version").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(h.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(h.map(_._2).toSeq == Seq(false, true, false),
      "only the published pointer target is current")
    assert(h.forall(r => r._3 > 0 && r._4 > 0), "files and bytes counted")
    // rollback retargets current without touching data
    t.rollback(1L)
    val h2 = t.history().orderBy("version").collect().map(_.getBoolean(1))
    assert(h2.toSeq == Seq(true, false, false))
  }
}
