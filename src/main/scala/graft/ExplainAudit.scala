package graft
/** Dev utility: print formatted plans for scale-critical queries. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("explain")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q2_filter_project", "q4_join_multi", "q1_agg")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
