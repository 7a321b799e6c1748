package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Child-JVM main for ExecutorLossRecoverySpec: proves the
  * reliable-checkpoint contract (docs/SCALING.md rule 14) under a REAL
  * executor loss, not just bit-identity of the two lineage-cut modes.
  *
  * Runs min-label connected components over a chain graph on a
  * `local-cluster[2,1,1024]` master (separate executor JVMs — the only
  * local mode where an executor can die without the driver), with
  * `spark.graft.checkpointDir` set so every iteration's [[graft.ops.Lineage.cut]]
  * writes reliable checkpoint FILES. After `killAfterJobs` Spark jobs a
  * watcher thread kill -9s one CoarseGrainedExecutorBackend process (the
  * chain diameter guarantees dozens of jobs remain). Recovery = the lost
  * executor's cached blocks are gone but every truncated lineage root is
  * on disk, so resubmitted tasks recompute from the checkpoint and the
  * run completes with the exact labels.
  *
  * Exit codes: 0 = killed an executor AND finished with correct labels;
  * 2 = could not find an executor to kill (environment problem, not a
  * recovery failure); 1 = anything else (including wrong labels).
  */
object RecoveryDemo {
  def main(args: Array[String]): Unit = {
    val ckptDir = args(0)
    val killAfterJobs = if (args.length > 1) args(1).toInt else 8
    val chainLen = if (args.length > 2) args(2).toInt else 24
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-recovery-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.checkpointDir", ckptDir)
      // executors must see the same classpath as this driver JVM
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    val appId = sc.applicationId

    @volatile var killedPid: Option[String] = None
    val killer = new SparkListener {
      private var jobs = 0
      override def onJobEnd(end: SparkListenerJobEnd): Unit = synchronized {
        jobs += 1
        if (jobs == killAfterJobs && killedPid.isEmpty) {
          // kill exactly one of OUR executors (cmdline carries the app id)
          val ps = new ProcessBuilder("ps", "-eo", "pid,args").start()
          val out = scala.io.Source.fromInputStream(ps.getInputStream)
            .getLines().toList
          ps.waitFor()
          out.find(l => l.contains("CoarseGrainedExecutorBackend") &&
              l.contains(appId)).foreach { line =>
            val pid = line.trim.takeWhile(_.isDigit)
            if (pid.nonEmpty) {
              new ProcessBuilder("kill", "-9", pid).start().waitFor()
              killedPid = Some(pid)
              // driver log marker the spec greps for
              println(s"KILLED_EXECUTOR $pid")
            }
          }
        }
      }
    }
    sc.addSparkListener(killer)

    import spark.implicits._
    // a chain: diameter = chainLen, so min-label CC runs chainLen rounds
    // (2-3 jobs each) — the kill lands squarely mid-iteration
    val edges = (0 until chainLen)
      .map(i => (i.toLong, (i + 1).toLong)).toDF("id1", "id2")
    val labels = graft.ops.DedupOps
      .connectedComponents(edges, maxIter = chainLen + 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val expected = (0 to chainLen).map(i => i.toLong -> 0L).toMap
    val ckptFiles = {
      val d = new java.io.File(ckptDir)
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      if (d.exists()) count(d) else 0
    }
    val ok = labels == expected && ckptFiles > 0
    if (killedPid.isEmpty) {
      println("NO_EXECUTOR_KILLED")
      spark.stop(); sys.exit(2)
    }
    println(s"labels_ok=${labels == expected} ckpt_files=$ckptFiles")
    if (ok) println("RECOVERY_OK")
    spark.stop()
    sys.exit(if (ok) 0 else 1)
  }
}
