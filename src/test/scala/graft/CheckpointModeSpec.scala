package graft

import graft.ops.{DedupOps, GraphOps, Lineage}
import org.apache.spark.sql.functions._

/** Reliable-checkpoint mode (docs/SCALING.md): with
  * `spark.graft.checkpointDir` set, every iterative op's lineage cut goes
  * through reliable `checkpoint()` (cluster-survivable blocks on a durable
  * filesystem) instead of `localCheckpoint` (executor-local, lost on
  * executor death). The switch must never change RESULTS — these tests run
  * the two heaviest iterative ops (q59's connected components, q89's
  * quantized PageRank) in both modes and demand bit-identical output. */
class CheckpointModeSpec extends SparkSpec {

  private def withReliable[A](body: => A): A = {
    val dir = tmpDir("graft-ckpt")
    spark.conf.set(Lineage.ConfKey, dir)
    try body
    finally spark.conf.set(Lineage.ConfKey, "")
  }

  private def edges = {
    import spark.implicits._
    // two chains + a triangle + self-contained pair: multi-round shapes
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L))
      .toDF("id1", "id2")
  }

  test("connected components: reliable mode is bit-identical to local mode") {
    val local = DedupOps.connectedComponents(edges)
      .orderBy("node").collect().toSeq
    val reliable = withReliable {
      DedupOps.connectedComponents(edges).orderBy("node").collect().toSeq
    }
    assert(reliable == local)
    assert(local.nonEmpty)
  }

  test("pageRank: reliable mode is bit-identical to local mode") {
    val e = edges.select(col("id1").as("src"), col("id2").as("dst"))
    val local = GraphOps.pageRankQuantized(e, iters = 3)
      .orderBy("node").collect().toSeq
    val reliable = withReliable {
      GraphOps.pageRankQuantized(e, iters = 3).orderBy("node").collect().toSeq
    }
    assert(reliable == local)
    assert(local.nonEmpty)
  }

  test("reliable mode actually writes checkpoint files under the configured dir") {
    val dir = tmpDir("graft-ckpt-files")
    spark.conf.set(Lineage.ConfKey, dir)
    try {
      DedupOps.connectedComponents(edges).count()
      val root = new java.io.File(dir)
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(root), s"expected reliable checkpoint blocks under $dir")
    } finally spark.conf.set(Lineage.ConfKey, "")
  }

  test("unset / blank conf routes to localCheckpoint (no dir required)") {
    spark.conf.set(Lineage.ConfKey, "")
    val out = DedupOps.connectedComponents(edges).count()
    assert(out > 0)
  }
}
