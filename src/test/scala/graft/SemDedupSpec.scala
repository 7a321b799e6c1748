package graft

import scala.collection.mutable

import graft.ops.SimilarityOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 120 random vectors + exact copies of the first 10 at ids 1000+. */
  lazy val corpus = {
    val rnd = new scala.util.Random(3L)
    val base = (0 until 120).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    (base ++ base.take(10).map { case (i, v) => (1000L + i, v) })
      .toDF("vec_id", "embedding")
  }

  test("exact semantic copies are dropped, originals kept") {
    val out = SimilarityOps.semDedup(corpus, threshold = 0.999, nlist = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    (0 until 10).foreach { i =>
      assert(out(i.toLong)._1 == 1L, s"original $i must be kept")
      assert(out(1000L + i) == ((0L, Some(i.toLong))),
        s"copy of $i must point at it, got ${out(1000L + i)}")
    }
    // vectors with no near-identical twin survive
    assert(out.count(_._2._1 == 1L) == 120)
  }

  test("threshold gates the dup decision") {
    val all = SimilarityOps.semDedup(corpus, threshold = -1.0, nlist = 1)
      .filter($"keep" === 1).count()
    // with cos >= -1 inside one cell, only the global smallest id survives
    assert(all == 1L)
  }

  /** Max shuffle-read records of any single task spawned by `action`
    * (job-group isolated — the shared session runs other suites). */
  private def maxTaskShuffleRead(action: => Unit): Long = {
    val group = s"semdedup-skew-${System.nanoTime()}"
    val stages = mutable.Set[Int]()
    @volatile var maxRec = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        if (Option(js.properties).exists(
            p => p.getProperty("spark.jobGroup.id") == group))
          stages.synchronized { stages ++= js.stageIds }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (stages.synchronized(stages.contains(te.stageId)) &&
            te.taskMetrics != null) {
          val r = te.taskMetrics.shuffleReadMetrics.recordsRead
          if (r > maxRec) maxRec = r
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, group)
      action
      spark.sparkContext.clearJobGroup()
      var last = -1L
      var spins = 0
      while (maxRec != last && spins < 50) {
        last = maxRec; spins += 1; Thread.sleep(100)
      }
      maxRec
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("maxCellSize splits the hot cell: same decisions, ≥4× smaller max task") {
    // planted skew: one cell holds ~80% of the corpus (2000 vectors in a
    // tight cluster of 10 identical-member groups), the rest is spread.
    // Without a cap the per-cell self-join puts |cell|² work in one task.
    val dim = 32
    def hotVec(i: Int): Seq[Float] = {
      val v = Array.fill(dim)(0f); v(0) = 1f; v(1 + i % 10) = 0.35f
      v.toSeq
    }
    val rnd = new scala.util.Random(11L)
    val hot = (0 until 2000).map(i => (i.toLong, hotVec(i)))
    val rest = (0 until 500).map(i =>
      (100000L + i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val skewed = (hot ++ rest).toDF("vec_id", "embedding").localCheckpoint()
    val trained = IndexedSeq(
      0 -> (1f +: Seq.fill(dim - 1)(0f)),
      1 -> Seq.fill(dim)(-0.5f))
    def run(cap: Option[Int]): DataFrame =
      SimilarityOps.semDedup(skewed, threshold = 0.96, nlist = 2,
        trained = Some(trained), maxCellSize = cap)
    def decisions(df: DataFrame): Set[(Long, Long, Long)] =
      df.select($"vec_id", $"keep", $"dup_of").collect().map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    def maxCell(df: DataFrame): Long =
      df.groupBy($"cell").count().agg(max($"count")).head().getLong(0)

    // dup decisions identical: identical vectors co-locate at every split
    // level, and nothing across groups clears the 0.96 threshold — the
    // split only adds cell borders the paper's approximation already
    // accepts
    assert(decisions(run(Some(150))) == decisions(run(None)))

    // the quadratic-work bound: the hot cell's row count drops ≥4×
    val (mcUncapped, mcCapped) = (maxCell(run(None)), maxCell(run(Some(150))))
    assert(mcUncapped >= 2000, s"skew not planted: $mcUncapped")
    assert(mcCapped * 4 <= mcUncapped,
      s"hot cell not split: uncapped=$mcUncapped capped=$mcCapped")

    // ...and the straggler task actually shrinks ≥4× (measured records,
    // not plan shape); fixed partitioning so AQE coalescing and 4-way
    // hash collisions don't blur the per-task signal
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // at toy scale Spark broadcasts the whole corpus and no shuffle-read
    // skew exists to measure; the 100 TB regime this caps for is the
    // shuffle-join one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val tUncapped = maxTaskShuffleRead(materialize(run(None)))
      val tCapped = maxTaskShuffleRead(materialize(run(Some(150))))
      assert(tUncapped > 0 && tCapped > 0, s"$tUncapped / $tCapped")
      assert(tCapped * 4 <= tUncapped,
        s"max task did not shrink: uncapped=$tUncapped capped=$tCapped")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
