package graft

import java.nio.file.{Files, Paths}

import graft.ops.IncrementalJoin
import graft.streaming.JoinStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming join maintenance vs the one-shot batch join, across
  * multiple drains with files appearing on either side in between. */
class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def multiset(df: DataFrame): Set[(Long, String, String, Long)] =
    df.select(col("k"), col("lv"), col("rv"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

  private def oneShot(l: DataFrame, r: DataFrame) =
    multiset(l.join(r, Seq("k"))
      .groupBy(col("k"), col("lv"), col("rv"))
      .agg(count(lit(1)).as("n")))

  test("drain, append files to both sides, re-drain: always equals batch join") {
    val root = tmpDir("joinstream")
    val (lDir, rDir) = (s"$root/left", s"$root/right")
    Files.createDirectories(Paths.get(lDir))
    Files.createDirectories(Paths.get(rDir))
    val st = IncrementalJoin.stores(spark, s"$root/stores")
    val lSchema = Seq((1L, "x")).toDF("k", "lv").schema
    val rSchema = Seq((1L, "x")).toDF("k", "rv").schema

    val l1 = Seq(1L -> "a", 2L -> "b", 1L -> "a").toDF("k", "lv")
    val r1 = Seq(1L -> "x", 3L -> "y").toDF("k", "rv")
    l1.coalesce(1).write.parquet(s"$lDir/f1")
    r1.coalesce(1).write.parquet(s"$rDir/f1")
    val first = JoinStream.maintainJoinAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multiset(first) == oneShot(l1, r1))

    // new files on BOTH sides; same checkpoints → only deltas process
    val l2 = Seq(3L -> "c").toDF("k", "lv")
    val r2 = Seq(2L -> "z", 1L -> "w").toDF("k", "rv")
    l2.coalesce(1).write.parquet(s"$lDir/f2")
    r2.coalesce(1).write.parquet(s"$rDir/f2")
    val second = JoinStream.maintainJoinAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multiset(second) ==
      oneShot(l1.unionByName(l2), r1.unionByName(r2)))

    // idle re-drain: checkpoints skip everything, result unchanged
    val third = JoinStream.maintainJoinAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multiset(third) == multiset(second))
  }

  private def multisetOuter(df: DataFrame): Set[(Long, String, Option[String], Long)] =
    df.select(col("k"), col("lv"), col("rv"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3))).toSet

  private def oneShotOuter(l: DataFrame, r: DataFrame) =
    multisetOuter(l.join(r, Seq("k"), "left")
      .groupBy(col("k"), col("lv"), col("rv"))
      .agg(count(lit(1)).as("n")))

  test("LEFT OUTER drain: unmatched rows null-extend, a later right file retracts them") {
    val root = tmpDir("joinstream-outer")
    val (lDir, rDir) = (s"$root/left", s"$root/right")
    Files.createDirectories(Paths.get(lDir))
    Files.createDirectories(Paths.get(rDir))
    val st = graft.ops.IncrementalOuterJoin.stores(spark, s"$root/stores")
    val lSchema = Seq((1L, "x")).toDF("k", "lv").schema
    val rSchema = Seq((1L, "x")).toDF("k", "rv").schema

    val l1 = Seq(1L -> "a", 2L -> "b").toDF("k", "lv")
    val r1 = Seq(1L -> "x").toDF("k", "rv")
    l1.coalesce(1).write.parquet(s"$lDir/f1")
    r1.coalesce(1).write.parquet(s"$rDir/f1")
    val first = JoinStream.maintainLeftOuterAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multisetOuter(first) == oneShotOuter(l1, r1))
    assert(multisetOuter(first).contains((2L, "b", None, 1L)))

    // a later right file matches key 2: the null row must retract at
    // stream cadence, through the same checkpointed incremental drain
    val r2 = Seq(2L -> "z").toDF("k", "rv")
    r2.coalesce(1).write.parquet(s"$rDir/f2")
    val second = JoinStream.maintainLeftOuterAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multisetOuter(second) == oneShotOuter(l1, r1.unionByName(r2)))
    assert(!multisetOuter(second).exists(t => t._1 == 2L && t._3.isEmpty))

    // idle re-drain: no-op
    val third = JoinStream.maintainLeftOuterAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multisetOuter(third) == multisetOuter(second))
  }

  private def multisetFull(df: DataFrame): Set[(Long, Option[String], Option[String], Long)] =
    df.select(col("k"), col("lv"), col("rv"), col("n"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3))).toSet

  test("FULL OUTER drain: both directions null-extend and retract at stream cadence") {
    val root = tmpDir("joinstream-full")
    val (lDir, rDir) = (s"$root/left", s"$root/right")
    Files.createDirectories(Paths.get(lDir))
    Files.createDirectories(Paths.get(rDir))
    val st = graft.ops.IncrementalFullOuterJoin.stores(spark, s"$root/stores")
    val lSchema = Seq((1L, "x")).toDF("k", "lv").schema
    val rSchema = Seq((1L, "x")).toDF("k", "rv").schema

    val l1 = Seq(1L -> "a", 2L -> "b").toDF("k", "lv")
    val r1 = Seq(1L -> "x", 3L -> "y").toDF("k", "rv")
    l1.coalesce(1).write.parquet(s"$lDir/f1")
    r1.coalesce(1).write.parquet(s"$rDir/f1")
    val first = JoinStream.maintainFullOuterAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multisetFull(first) == Set(
      (1L, Some("a"), Some("x"), 1L),
      (2L, Some("b"), None, 1L),
      (3L, None, Some("y"), 1L)))

    // new files match both dangling keys: both null rows retract
    Seq(3L -> "c").toDF("k", "lv").coalesce(1).write.parquet(s"$lDir/f2")
    Seq(2L -> "z").toDF("k", "rv").coalesce(1).write.parquet(s"$rDir/f2")
    val second = JoinStream.maintainFullOuterAvailableNow(spark,
      s"$lDir/*", lSchema, s"$rDir/*", rSchema, st, Seq("k"), s"$root/ckpt")
    assert(multisetFull(second) == Set(
      (1L, Some("a"), Some("x"), 1L),
      (2L, Some("b"), Some("z"), 1L),
      (3L, Some("c"), Some("y"), 1L)))
  }

  test("CDC signed drain: deletes/updates flow through the join at stream cadence") {
    import org.apache.spark.sql.types._
    val root = tmpDir("joinstream-cdc")
    val topic = s"$root/topic"
    Files.createDirectories(Paths.get(topic))
    val row = StructType(Seq(StructField("k", LongType),
      StructField("lv", StringType)))
    def env(op: String, before: String, after: String) =
      s"""{"payload": {"before": $before, "after": $after, "op": "$op", "ts_ms": 1}}"""
    def writeWave(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(topic, name), lines.mkString("\n").getBytes)

    val st = IncrementalJoin.stores(spark, s"$root/stores")
    IncrementalJoin.appendRight(st,
      Seq(1L -> "x", 2L -> "y", 3L -> "z").toDF("k", "rv"), Seq("k"), 0L)
    writeWave("w0.jsonl", Seq(
      env("c", "null", """{"k": 1, "lv": "a"}"""),
      env("c", "null", """{"k": 2, "lv": "b"}"""),
      env("c", "null", """{"k": 3, "lv": "c"}""")))
    val n1 = JoinStream.drainCdcSignedAvailableNow(spark, topic, row, st,
      Seq("k"), isLeft = true, checkpointDir = s"$root/ckpt")
    assert(n1 >= 1)
    assert(multiset(IncrementalJoin.current(st)) == Set(
      (1L, "a", "x", 1L), (2L, "b", "y", 1L), (3L, "c", "z", 1L)))

    // a later file carries an update AND a delete; the resumed drain
    // processes ONLY it, and the maintained join nets exactly
    writeWave("w1.jsonl", Seq(
      env("u", """{"k": 1, "lv": "a"}""", """{"k": 1, "lv": "a2"}"""),
      env("d", """{"k": 2, "lv": "b"}""", "null")))
    val n2 = JoinStream.drainCdcSignedAvailableNow(spark, topic, row, st,
      Seq("k"), isLeft = true, checkpointDir = s"$root/ckpt")
    assert(n2 >= 1)
    assert(multiset(IncrementalJoin.current(st)) == Set(
      (1L, "a2", "x", 1L), (3L, "c", "z", 1L)))

    // an idle re-drain applies nothing and changes nothing
    JoinStream.drainCdcSignedAvailableNow(spark, topic, row, st,
      Seq("k"), isLeft = true, checkpointDir = s"$root/ckpt")
    assert(multiset(IncrementalJoin.current(st)) == Set(
      (1L, "a2", "x", 1L), (3L, "c", "z", 1L)))
  }

  test("CDC tree drain: restart-resume processes only new files, state nets") {
    import org.apache.spark.sql.types._
    import graft.ops.JoinTreeIvm
    val root = tmpDir("treestream-cdc")
    val fTopic = s"$root/ftopic"; val cTopic = s"$root/ctopic"
    Files.createDirectories(Paths.get(fTopic))
    Files.createDirectories(Paths.get(cTopic))
    val factRow = StructType(Seq(StructField("k", LongType),
      StructField("fv", StringType)))
    val custRow = StructType(Seq(StructField("k", LongType),
      StructField("m", LongType)))
    def env(op: String, before: String, after: String) =
      s"""{"payload": {"before": $before, "after": $after, "op": "$op", "ts_ms": 1}}"""
    def writeWave(topic: String, name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(topic, name), lines.mkString("\n").getBytes)

    val tree = JoinTreeIvm.stores(spark, s"$root/tree",
      Seq(Seq("k"), Seq("m")), buckets = 2)
    JoinTreeIvm.appendLeaf(tree, 2,
      Seq(10L -> "t0", 20L -> "t1").toDF("m", "tag"), 0L)
    writeWave(cTopic, "w0.jsonl", Seq(
      env("c", "null", """{"k": 1, "m": 10}"""),
      env("c", "null", """{"k": 2, "m": 20}""")))
    writeWave(fTopic, "w0.jsonl", Seq(
      env("c", "null", """{"k": 1, "fv": "a"}"""),
      env("c", "null", """{"k": 2, "fv": "b"}""")))
    JoinStream.drainCdcTreeLeafAvailableNow(spark, cTopic, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptC")
    JoinStream.drainCdcTreeLeafAvailableNow(spark, fTopic, factRow, tree,
      leaf = 0, checkpointDir = s"$root/ckptF")
    def cur() = JoinTreeIvm.current(tree)
      .select(col("k"), col("fv"), col("tag"), col("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(cur() == Set((1L, "a", "t0", 1L), (2L, "b", "t1", 1L)))

    // later files on both topics: a fact update and a customer TAKEDOWN;
    // the resumed drains process ONLY them (same checkpoints) and the
    // takedown cascades through both levels
    writeWave(fTopic, "w1.jsonl", Seq(
      env("u", """{"k": 1, "fv": "a"}""", """{"k": 1, "fv": "a2"}""")))
    writeWave(cTopic, "w1.jsonl", Seq(
      env("d", """{"k": 2, "m": 20}""", "null")))
    JoinStream.drainCdcTreeLeafAvailableNow(spark, cTopic, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptC")
    JoinStream.drainCdcTreeLeafAvailableNow(spark, fTopic, factRow, tree,
      leaf = 0, checkpointDir = s"$root/ckptF")
    assert(cur() == Set((1L, "a2", "t0", 1L)))

    // idle re-drains change nothing
    JoinStream.drainCdcTreeLeafAvailableNow(spark, cTopic, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptC")
    JoinStream.drainCdcTreeLeafAvailableNow(spark, fTopic, factRow, tree,
      leaf = 0, checkpointDir = s"$root/ckptF")
    assert(cur() == Set((1L, "a2", "t0", 1L)))
  }

  test("two topics on ONE leaf: overlapping id spaces fail fast, disjoint ones merge") {
    // Both drains count micro-batches from zero; at the same idOffset
    // the second topic's batches would collide with committed ids in
    // the entry manifest and be swallowed as exactly-once replays —
    // silent data loss. The drain claim turns that into an error.
    import org.apache.spark.sql.types._
    import graft.ops.JoinTreeIvm
    val root = tmpDir("treestream-claim")
    val topicA = s"$root/tA"; val topicB = s"$root/tB"
    Files.createDirectories(Paths.get(topicA))
    Files.createDirectories(Paths.get(topicB))
    val custRow = StructType(Seq(StructField("k", LongType),
      StructField("m", LongType)))
    def env(after: String) =
      s"""{"payload": {"before": null, "after": $after, "op": "c", "ts_ms": 1}}"""
    val tree = JoinTreeIvm.stores(spark, s"$root/tree",
      Seq(Seq("k"), Seq("m")), buckets = 2)
    JoinTreeIvm.appendLeaf(tree, 2,
      Seq(10L -> "t0", 20L -> "t1").toDF("m", "tag"), 0L)
    JoinTreeIvm.appendLeaf(tree, 0,
      Seq(1L -> "a", 2L -> "b").toDF("k", "fv"), 1L)
    Files.write(Paths.get(topicA, "w0.jsonl"),
      env("""{"k": 1, "m": 10}""").getBytes)
    Files.write(Paths.get(topicB, "w0.jsonl"),
      env("""{"k": 2, "m": 20}""").getBytes)
    JoinStream.drainCdcTreeLeafAvailableNow(spark, topicA, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptA")
    // same leaf, DIFFERENT checkpoint, same (default) idOffset: refused
    val e = intercept[IllegalArgumentException] {
      JoinStream.drainCdcTreeLeafAvailableNow(spark, topicB, custRow, tree,
        leaf = 1, checkpointDir = s"$root/ckptB")
    }
    assert(e.getMessage.contains("disjoint idOffset"), e.getMessage)
    // a disjoint id space merges cleanly
    JoinStream.drainCdcTreeLeafAvailableNow(spark, topicB, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptB",
      idOffset = JoinStream.RightIdOffset)
    def cur() = JoinTreeIvm.current(tree)
      .select(col("k"), col("fv"), col("tag"), col("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(cur() == Set((1L, "a", "t0", 1L), (2L, "b", "t1", 1L)),
      "both topics' rows must reach the tree")
    // restart-resume under the SAME checkpoint and offset stays legal...
    JoinStream.drainCdcTreeLeafAvailableNow(spark, topicA, custRow, tree,
      leaf = 1, checkpointDir = s"$root/ckptA")
    assert(cur() == Set((1L, "a", "t0", 1L), (2L, "b", "t1", 1L)))
    // ...but the same checkpoint changing its offset mid-stream is not
    val e2 = intercept[IllegalArgumentException] {
      JoinStream.drainCdcTreeLeafAvailableNow(spark, topicA, custRow, tree,
        leaf = 1, checkpointDir = s"$root/ckptA", idOffset = 7L)
    }
    assert(e2.getMessage.contains("mid-stream"), e2.getMessage)
  }
}
