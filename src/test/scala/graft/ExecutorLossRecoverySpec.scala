package graft

/** Executor-LOSS recovery gate for reliable-checkpoint mode.
  *
  * CheckpointModeSpec proves the two lineage-cut modes are bit-identical;
  * this spec proves the property that mode exists FOR: with
  * `spark.graft.checkpointDir` set, an iterative op survives losing a
  * real executor JVM mid-run. The demo must run on a
  * `local-cluster[2,1,1024]` master, which cannot coexist with the
  * suite's shared local[4] context — so it runs in a child JVM
  * ([[RecoveryDemo]]) with this JVM's classpath, and the spec asserts
  * the three-part contract: an executor WAS killed (no vacuous pass),
  * checkpoint files were written, and the final labels are exact.
  */
class ExecutorLossRecoverySpec extends SparkSpec {

  test("CC completes with exact labels after kill -9 of an executor") {
    val ckpt = tmpDir("recovery-ckpt")
    val logF = java.nio.file.Files.createTempFile("recovery-demo", ".log")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val pb = new ProcessBuilder(
      javaBin, "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.RecoveryDemo", ckpt, "8", "24")
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // the in-process Worker's executor launcher derives the classpath
    // layout from this (spark-shell exports it via load-spark-env.sh;
    // a bare JVM must set it or executor launch dies with
    // "Cannot find any build directories")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(logF.toFile)
    val p = pb.start()
    val done = p.waitFor(420, java.util.concurrent.TimeUnit.SECONDS)
    val log = java.nio.file.Files.readString(logF)
    if (!done) { p.destroyForcibly(); fail(s"demo timed out; tail:\n${log.takeRight(2000)}") }
    assert(p.exitValue() == 0,
      s"demo exit ${p.exitValue()}; tail:\n${log.takeRight(3000)}")
    assert(log.contains("KILLED_EXECUTOR"), "no executor was killed — vacuous run")
    assert(log.contains("RECOVERY_OK"), "labels or checkpoint files wrong")
  }
}
