package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for iterative operators.
  *
  * Every iterative op in the engine (connected components, PageRank, BPE
  * training, LSH candidate materialization, IVF training) must truncate
  * plan lineage each round or the plan grows iteration-deep — the classic
  * iterative-Spark trap. HOW the cut happens is a fault-tolerance choice:
  *
  *  - `localCheckpoint` stores blocks on executors only. Fast (no
  *    filesystem round-trip), but on a real cluster a single executor
  *    loss makes the job unrecoverable: lineage is truncated and the
  *    blocks are gone. Acceptable on local[n] where "executor loss"
  *    means the whole JVM died anyway.
  *  - reliable `checkpoint()` writes blocks to a (typically HDFS/object
  *    store) checkpoint directory. Slower per cut, but any executor can
  *    be lost and the job recovers — the posture a 1000-executor run
  *    needs.
  *
  * [[cut]] routes every call site through one switch: set
  * `spark.graft.checkpointDir` (sql conf, settable at runtime or via the
  * `GRAFT_CHECKPOINT_DIR` env through [[graft.GraftSession]]) and all
  * iterative ops use reliable checkpoints under that directory; unset, the
  * local[n]-appropriate `localCheckpoint` is used. Results are
  * bit-identical either way (asserted by CheckpointModeSpec) — the switch
  * trades wall-clock for fault tolerance, never semantics.
  *
  * docs/SCALING.md rule 14 states the contract: on a multi-executor
  * cluster, ALWAYS set `spark.graft.checkpointDir` to a path on the
  * cluster's durable filesystem.
  */
object Lineage {

  val ConfKey = "spark.graft.checkpointDir"

  /** Cut the plan lineage of `df`, materializing it.
    *
    * @param eager materialize now (default) or on first use. Lazy cuts
    *              are for frames that may never be evaluated (e.g. the
    *              final iteration's ranks when the caller only samples).
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    checkpointDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir appends a UUID subdir, so the effective dir's
        // PARENT is what a conf value compares against. Exact fs-qualified
        // path equality — a substring test would silently ignore a runtime
        // re-point to a prefix of the current path (e.g. /data/ckpt → /data).
        val want = {
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
        }
        val currentParent = sc.getCheckpointDir
          .map(d => new org.apache.hadoop.fs.Path(d).getParent.toString)
        if (!currentParent.contains(want)) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** The configured reliable-checkpoint directory, if any. */
  def checkpointDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)

  /** True when reliable-checkpoint mode is active for this session. */
  def reliable(df: DataFrame): Boolean = checkpointDir(df).isDefined

  /** `df.cutLineage()` chain syntax for [[cut]]. */
  implicit class LineageSyntax(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = Lineage.cut(df, eager)
  }
}
