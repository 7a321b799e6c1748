package graft

import graft.ops.SimilarityOps

/** Signed (deletable) IVF index: takedowns net memberships to zero,
  * re-embeds move vectors across cells as −old/+new deltas, replays are
  * physical no-ops across compactions, and probes stay directory-pruned
  * to the probed cells. */
class SignedIvfSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private val centroids = IndexedSeq(
    0 -> vec(1, 0, 0, 0),
    1 -> vec(0, 1, 0, 0))

  private val corpus = Seq(
    (10L, vec(0.99, 0.10, 0, 0)), // cell 0
    (11L, vec(0.98, 0.15, 0, 0)), // cell 0
    (20L, vec(0.10, 0.95, 0, 0))) // cell 1

  private def queryX = Seq((100L, vec(1.0, 0, 0, 0))).toDF("q_id", "q_vec")
  private def queryY = Seq((101L, vec(0, 1.0, 0, 0))).toDF("q_id", "q_vec")

  private def topIds(idx: SimilarityOps.SignedIvfIndex,
                     q: org.apache.spark.sql.DataFrame): Seq[Long] =
    SimilarityOps.signedIvfTopK(idx, q, k = 3, nprobe = 1)
      .orderBy($"rank").select("vec_id").as[Long].collect().toSeq

  test("cell ids beyond the c%02d layout are refused at open") {
    // 'c100' would truncate to the 3-char prefix 'c10' (colliding with
    // cell 10) and the probe's exact-key filter would silently miss it
    val wide = IndexedSeq(0 -> vec(1, 0, 0, 0), 100 -> vec(0, 1, 0, 0))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.openSignedIvf(spark, tmpDir("sivf"), wide)
    }
    assert(e.getMessage.contains("[0, 99]"))
  }

  test("takedown removes a vector from probe results; replay is a no-op") {
    val idx = SimilarityOps.openSignedIvf(spark, tmpDir("sivf"), centroids)
    SimilarityOps.signedIvfAppend(idx,
      corpus.toDF("vec_id", "embedding"), 0L)
    assert(topIds(idx, queryX) == Seq(10L, 11L))
    val td = Seq((10L, vec(0.99, 0.10, 0, 0), -1L))
      .toDF("vec_id", "embedding", "__delta")
    SimilarityOps.signedIvfAppend(idx, td, 1L, Some("__delta"))
    assert(topIds(idx, queryX) == Seq(11L))
    SimilarityOps.signedIvfCompact(idx)
    // post-compaction replayed takedown: manifest no-op (a second −1
    // would drive the net negative and a later re-insert would vanish)
    SimilarityOps.signedIvfAppend(idx, td, 1L, Some("__delta"))
    assert(topIds(idx, queryX) == Seq(11L))
    // the vector can come back under a fresh batch id
    SimilarityOps.signedIvfAppend(idx,
      Seq((10L, vec(0.99, 0.10, 0, 0))).toDF("vec_id", "embedding"), 2L)
    assert(topIds(idx, queryX) == Seq(10L, 11L))
  }

  test("re-embed moves a vector across cells under one batch id") {
    val idx = SimilarityOps.openSignedIvf(spark, tmpDir("sivf"), centroids)
    SimilarityOps.signedIvfAppend(idx,
      corpus.toDF("vec_id", "embedding"), 0L)
    val move = Seq(
      (11L, vec(0.98, 0.15, 0, 0), -1L), // retract from cell 0
      (11L, vec(0.05, 0.99, 0, 0), 1L) //  re-embed into cell 1
    ).toDF("vec_id", "embedding", "__delta")
    SimilarityOps.signedIvfAppend(idx, move, 1L, Some("__delta"))
    assert(topIds(idx, queryX) == Seq(10L))
    assert(topIds(idx, queryY) == Seq(11L, 20L))
    SimilarityOps.signedIvfCompact(idx)
    assert(topIds(idx, queryX) == Seq(10L))
    assert(topIds(idx, queryY) == Seq(11L, 20L))
  }

  test("the probe scan prunes to the probed cell directory") {
    val idx = SimilarityOps.openSignedIvf(spark, tmpDir("sivf"), centroids)
    SimilarityOps.signedIvfAppend(idx,
      corpus.toDF("vec_id", "embedding"), 0L)
    val plan = SimilarityOps.signedIvfTopK(idx, queryX, k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*prefix[^\\]]*\\]".r
      .findFirstIn(plan).isDefined, s"no prefix pruning in:\n$plan")
  }
}
