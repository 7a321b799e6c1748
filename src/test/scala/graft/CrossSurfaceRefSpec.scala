package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.ops.{DedupOps, IncrementalAgg, IncrementalCc,
  IncrementalTextIndex, JoinTreeIvm}
import graft.sinks.StoreSetRef
import graft.streaming.CorpusStream

/** Cross-surface atomic read consistency ([[StoreSetRef]]): a reader
  * resolving every serving surface through ONE committed ref observes
  * all-old or all-new — never the BM25 index post-batch with the
  * cluster labels pre-batch. The RTBF test PAUSES the drain mid-batch
  * via the injectable hook (the index has the batch, admission and
  * labels do not) and proves the pinned reader still sees all-old while
  * a direct reader already sees the mix. */
class CrossSurfaceRefSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.toJSON.collect().toSet

  test("RTBF drain paused mid-batch: pinned reader all-old, direct reader mixed") {
    val root = tmpDir("xsurf")
    val topic = s"$root/topic"
    val index = IncrementalTextIndex.stores(spark, s"$root/index", "doc_id")
    val admission = DedupOps.signedBucketStore(spark, s"$root/admission")
    val members = DedupOps.signedBucketStore(spark, s"$root/members")
    val cc = IncrementalCc.signedStores(spark, s"$root/cc")
    val ref = new StoreSetRef(spark, s"$root/ref",
      CorpusStream.rtbfSurfaces(index, admission, members, cc))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("__delta", LongType)))
    val docs0 = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "alpha bravo charlie delta echo foxtrot"), // exact twin of 1
      (3L, "golf hotel india juliet kilo lima"))
    val docs1 = Seq(
      (4L, "mike november oscar papa quebec romeo"),
      (5L, "golf hotel india juliet kilo lima")) // twin of 3
    val lookup = (docs0 ++ docs1).toDF("doc_id", "text").localCheckpoint()
    def emit(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").withColumn("__delta", lit(1L))
        .coalesce(1).write.mode("append").parquet(topic)
    def drain(hook: () => Unit): Long =
      CorpusStream.maintainRtbfAvailableNow(spark, topic, schema,
        index, admission, members, cc, lookup,
        checkpointDir = s"$root/ckpt", k = 16, bands = 4,
        maxFilesPerTrigger = Some(1), setRef = Some(ref),
        midBatch = hook)

    emit(docs0)
    drain(() => ())
    assert(ref.currentSeq().nonEmpty, "the drain must commit one ref per batch")
    def surfaces(): (DataFrame, DataFrame, DataFrame) = {
      val (idx, adm, labels) = CorpusStream.rtbfSnapshot(ref, "doc_id")
      (IncrementalTextIndex.bm25(idx, Seq("alpha", "golf"))
         .select($"doc_id", floor($"score" * 1e4).cast("long").as("s")),
       IncrementalAgg.current(adm, DedupOps.signedBucketSpec("doc_id"))
         .select($"doc_id"),
       IncrementalCc.currentLabels(labels))
    }
    val (oldBm, oldAdm, oldCc) = surfaces()
    val (wantBm, wantAdm, wantCc) = (rows(oldBm), rows(oldAdm), rows(oldCc))

    // wave 1 lands while the drain is PAUSED between surface commits
    emit(docs1)
    val reached = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val runner = new Thread(() => { drain { () =>
      reached.countDown(); release.await() }; () })
    runner.start()
    reached.await()
    try {
      // DIRECT reader: the live index already serves wave-1 docs (the
      // mixed state the ref exists to hide) ...
      val liveBm = IncrementalTextIndex.bm25(index, Seq("alpha", "golf"))
      assert(liveBm.filter($"doc_id" >= 4L).count() > 0,
        "fixture error: mid-batch the live index should hold wave 1")
      // ... while the cluster labels do NOT have doc 5's twin edge yet
      assert(IncrementalCc.currentLabels(cc).filter($"node" === 5L)
        .count() == 0, "fixture error: labels must lag mid-batch")
      // PINNED reader: all three surfaces still read the wave-0 state
      val (pBm, pAdm, pCc) = surfaces()
      assert(rows(pBm) == wantBm, "pinned BM25 leaked mid-batch state")
      assert(rows(pAdm) == wantAdm, "pinned admission leaked mid-batch state")
      assert(rows(pCc) == wantCc, "pinned labels leaked mid-batch state")
    } finally {
      release.countDown()
      runner.join()
    }
    // drained: a fresh snapshot is all-NEW and equals the direct reads
    val (nBm, nAdm, nCc) = surfaces()
    assert(rows(nBm) ==
      rows(IncrementalTextIndex.bm25(index, Seq("alpha", "golf"))
        .select($"doc_id", floor($"score" * 1e4).cast("long").as("s"))))
    assert(rows(nAdm) == rows(
      IncrementalAgg.current(admission, DedupOps.signedBucketSpec("doc_id"))
        .select($"doc_id")))
    assert(rows(nCc) == rows(IncrementalCc.currentLabels(cc)))
    assert(nCc.filter($"node" === 5L).count() == 1,
      "post-drain snapshot must include wave 1 everywhere")
  }

  test("join tree: a pinned view never shows the aggregate ahead of the multiset") {
    val st = JoinTreeIvm.stores(spark, tmpDir("xtree"),
      Seq(Seq("ck"), Seq("nk")), buckets = 4,
      aggSpec = Some(IncrementalAgg.Spec(Seq("name"), Seq("v"))))
    val ref = new StoreSetRef(spark, tmpDir("xtree-ref"),
      JoinTreeIvm.serveSurfaces(st))
    JoinTreeIvm.appendLeaf(st, 1, Seq((1L, 10L), (2L, 20L)).toDF("ck", "nk"), 0L)
    JoinTreeIvm.appendLeaf(st, 2, Seq((10L, "n10"), (20L, "n20")).toDF("nk", "name"), 1L)
    JoinTreeIvm.appendLeaf(st, 0, Seq((1L, 1L, 5L), (2L, 2L, 7L)).toDF("ok", "ck", "v"), 2L)
    ref.commit() // the writer's batch boundary
    val pin1 = JoinTreeIvm.pinnedView(st, ref.snapshot())
    val oldCur = rows(JoinTreeIvm.current(pin1))
    val oldAgg = rows(JoinTreeIvm.currentAgg(pin1))
    // batch 2 lands in the stores but the ref has NOT advanced — the
    // window where a direct reader could see agg and multiset disagree
    JoinTreeIvm.appendLeaf(st, 0, Seq((3L, 1L, 100L)).toDF("ok", "ck", "v"), 3L)
    assert(rows(JoinTreeIvm.current(st)) != oldCur,
      "fixture error: batch 2 must be visible to a direct reader")
    val pinAgain = JoinTreeIvm.pinnedView(st, ref.snapshot())
    assert(rows(JoinTreeIvm.current(pinAgain)) == oldCur,
      "pinned multiset leaked batch 2")
    assert(rows(JoinTreeIvm.currentAgg(pinAgain)) == oldAgg,
      "pinned aggregate leaked batch 2")
    // ref advances: all-new across both surfaces, equal to direct reads
    ref.commit()
    val pin2 = JoinTreeIvm.pinnedView(st, ref.snapshot())
    assert(rows(JoinTreeIvm.current(pin2)) == rows(JoinTreeIvm.current(st)))
    assert(rows(JoinTreeIvm.currentAgg(pin2)) ==
      rows(JoinTreeIvm.currentAgg(st)))
    // set-level time travel: the first committed ref still resolves
    val seq1 = ref.currentSeq().get - 1
    val pinOld = JoinTreeIvm.pinnedView(st, ref.snapshotAt(seq1))
    assert(rows(JoinTreeIvm.current(pinOld)) == oldCur)
    // pinned views are read-only
    intercept[UnsupportedOperationException] {
      ref.snapshot()("out").append(Seq((1L, "x")).toDF("a", "b"))
    }
  }
}
