package graft

/** Child-JVM main for ClusterParitySpec: run a representative query set
  * on a `local-cluster[2,2,1536]` master — REAL separate executor JVMs —
  * and dump each result to parquet for the parent suite to compare
  * against the in-process local[n] answers.
  *
  * What this exercises that local[n] cannot: closure and expression
  * serialization across JVM boundaries (custom TypedImperativeAggregate
  * buffers, the PQ codebook reference objects, ThreadLocal codec caches
  * re-initialized per executor), broadcast distribution, and shuffle IO
  * between processes. A query whose operator state doesn't survive the
  * wire fails HERE, long before a 1000-executor cluster.
  *
  * args: <sfDir> <outDir> <comma-separated query names>
  * Exit 0 = every query ran and wrote; 1 = any failure (named on stderr).
  */
object ClusterParityDemo {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder("graft-cluster-parity", cores = 8)
      .master("local-cluster[2,2,1536]")
      .config("spark.sql.shuffle.partitions", "8")
      // executors must see this driver JVM's classpath (repo classes +
      // spark jars); local-cluster does not inherit it
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // per-query progress + wall to the parent's log: a parity
        // timeout then names the query that ate the budget
        println(f"[parity] $name ok ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      catch { case e: Throwable =>
        failed = true
        System.err.println(s"[parity] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
    sys.exit(if (failed) 1 else 0)
  }
}
