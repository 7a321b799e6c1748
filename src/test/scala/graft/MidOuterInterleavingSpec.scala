package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalAgg, JoinTreeIvm}

/** Interleaving regression for MID-tree outer IVM: q211/q214 fire the
  * fact takedown LAST; the q216 CDC drain order fires it BEFORE the
  * late-dim flip waves (a retraction lands while most facts are still
  * null-extended, then the dim arrives and flips the survivors). The
  * maintained state must be interleaving-invariant — every order of
  * the same signed multiset of batches nets to the one-shot chained
  * LEFT JOIN. */
class MidOuterInterleavingSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(fact: DataFrame, sup: DataFrame,
                      part: DataFrame): Set[Seq[Any]] =
    fact.join(sup, Seq("sk"), "left").join(part, Seq("pk"), "left")
      .groupBy(coalesce($"snk", lit(-1L)).as("snk"),
        coalesce($"psize", lit(-1L)).as("psize"))
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
      .collect().map(_.toSeq).toSet

  private def served(st: JoinTreeIvm.Stores): Set[Seq[Any]] =
    JoinTreeIvm.currentAgg(st)
      .select(coalesce($"snk", lit(-1L)).as("snk"),
        coalesce($"psize", lit(-1L)).as("psize"),
        $"n_rows", $"sum_cents")
      .collect().map(_.toSeq).toSet

  test("fact takedown BEFORE late-dim flips nets to the one-shot join") {
    val fact = (0L until 48L).map(i =>
      (i % 6, i % 4, 100L + i)).toDF("sk", "pk", "cents")
    val sup = (0L until 6L).map(k => (k, 10L + k % 3)).toDF("sk", "snk")
    val part = (0L until 4L).filter(_ % 2 == 0)
      .map(p => (p, 50L + p)).toDF("pk", "psize")
    val st = JoinTreeIvm.stores(spark, tmpDir("moi-tree"),
      Seq(Seq("sk"), Seq("pk")), buckets = 4,
      outerLevels = Seq(0), outerLast = true,
      aggSpec = Some(IncrementalAgg.Spec(Seq("snk", "psize"),
        Seq("cents"))))
    // the q216 order: partial dim seeds, all facts, fact TAKEDOWN,
    // then the late dim1 wave (flips across level 1), then a dim1
    // delete wave (flips back)
    JoinTreeIvm.appendLeaf(st, 1, sup.filter($"sk" % 2 === 0), 0L)
    JoinTreeIvm.appendLeaf(st, 2, part, 1L)
    JoinTreeIvm.appendLeafDelta(st, 0,
      fact.withColumn("__delta", lit(1L)), 2L)
    JoinTreeIvm.appendLeafDelta(st, 0,
      fact.filter($"cents" % 5 === 0).withColumn("__delta", lit(-1L)), 3L)
    val netFact = fact.filter($"cents" % 5 =!= 0)
    assert(served(st) ==
      oneShot(netFact, sup.filter($"sk" % 2 === 0), part),
      "after the takedown, before the late dim")
    JoinTreeIvm.appendLeafDelta(st, 1,
      sup.filter($"sk" % 2 =!= 0).withColumn("__delta", lit(1L)), 4L)
    assert(served(st) == oneShot(netFact, sup, part),
      "after the late-dim flip wave")
    JoinTreeIvm.appendLeafDelta(st, 1,
      sup.filter($"sk" % 3 === 1).withColumn("__delta", lit(-1L)), 5L)
    assert(served(st) ==
      oneShot(netFact, sup.filter($"sk" % 3 =!= 1), part),
      "after the dim delete wave")
  }

  test("the CDC drain order (q216) nets to the one-shot join, live and pinned") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fact = (0L until 48L).map(i =>
      (i % 6, i % 4, 100L + i)).toDF("sk", "pk", "cents")
    val sup = (0L until 6L).map(k => (k, 10L + k % 3)).toDF("sk", "snk")
    val part = (0L until 4L).filter(_ % 2 == 0)
      .map(p => (p, 50L + p)).toDF("pk", "psize")
    def env(before: org.apache.spark.sql.Column,
            after: org.apache.spark.sql.Column, op: String) =
      to_json(struct(struct(before.as("before"), after.as("after"),
        lit(op).as("op"), lit(0L).as("ts_ms")).as("payload")))
    val factRow = StructType(Seq(StructField("sk", LongType),
      StructField("pk", LongType), StructField("cents", LongType)))
    val supRow = StructType(Seq(StructField("sk", LongType),
      StructField("snk", LongType)))
    def mkTopic(prefix: String, waves: Seq[DataFrame]): String = {
      val topic = tmpDir(prefix)
      val topicPath = new org.apache.hadoop.fs.Path(topic)
      val fs = topicPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t0 = System.currentTimeMillis()
      waves.zipWithIndex.foreach { case (w, i) =>
        val waveDir = new org.apache.hadoop.fs.Path(topic, s"_w$i")
        w.coalesce(1).write.mode("overwrite").text(waveDir.toString)
        val it = fs.listFiles(waveDir, false)
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.startsWith("part-")) {
            val dst = new org.apache.hadoop.fs.Path(topicPath,
              s"wave$i.jsonl")
            fs.rename(f, dst)
            fs.setTimes(dst, t0 + i * 60000L, -1L)
          }
        }
        fs.delete(waveDir, true)
      }
      topic
    }
    val factBase = struct($"sk", $"pk", $"cents")
    val factNull = lit(null).cast(factRow)
    val factTopic = mkTopic("moi-fact", Seq(
      fact.select(env(factNull, factBase, "c").as("value")),
      fact.filter($"cents" % 5 === 0)
        .select(env(factBase, factNull, "d").as("value"))))
    val supBase = struct($"sk", $"snk")
    val supNull = lit(null).cast(supRow)
    val supTopic = mkTopic("moi-sup", Seq(
      sup.filter($"sk" % 2 =!= 0)
        .select(env(supNull, supBase, "c").as("value")),
      sup.filter($"sk" % 3 === 1)
        .select(env(supBase, supNull, "d").as("value"))))
    val root = tmpDir("moi-tree2")
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("sk"), Seq("pk")),
      buckets = 4, outerLevels = Seq(0), outerLast = true,
      aggSpec = Some(IncrementalAgg.Spec(Seq("snk", "psize"),
        Seq("cents"))))
    val ref = new graft.sinks.StoreSetRef(spark, s"$root/_refs",
      JoinTreeIvm.serveSurfaces(st))
    JoinTreeIvm.appendLeaf(st, 1, sup.filter($"sk" % 2 === 0), 0L)
    JoinTreeIvm.appendLeaf(st, 2, part, 1L)
    ref.commit()
    val nFact = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      spark, factTopic, factRow, st, leaf = 0,
      checkpointDir = s"$root/_ckpt_fact", maxFilesPerTrigger = Some(1),
      setRef = Some(ref))
    val nSup = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      spark, supTopic, supRow, st, leaf = 1,
      checkpointDir = s"$root/_ckpt_sup", idOffset = 1000L,
      maxFilesPerTrigger = Some(1), setRef = Some(ref))
    assert(nFact == 2 && nSup == 2, s"fact=$nFact sup=$nSup")
    val want = oneShot(fact.filter($"cents" % 5 =!= 0),
      sup.filter($"sk" % 3 =!= 1), part)
    assert(served(st) == want, "LIVE read after the drains")
    val pinned = JoinTreeIvm.pinnedView(st, ref.snapshot())
    assert(served(pinned) == want, "PINNED read at the last ref")
  }
}
