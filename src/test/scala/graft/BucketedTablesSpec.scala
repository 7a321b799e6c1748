package graft

import org.apache.spark.sql.functions._

import graft.sinks.BucketedTables

class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any shuffle exchange") {
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    BucketedTables.writeBucketed(li, "b_lineitem", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))
    BucketedTables.writeBucketed(ord, "b_orders", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))

    // force SortMergeJoin (at this tiny sf AQE would broadcast instead,
    // which hides the shuffle question entirely)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.read(spark, "b_lineitem")
        .join(BucketedTables.read(spark, "b_orders"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_totalprice")
      assert(BucketedTables.isShuffleFree(joined),
        "bucketed join still shuffles:\n" + joined.queryExecution.executedPlan)
      // and the result is correct vs the plain join
      val plain = li.join(ord, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == plain)

      // contrast: the unbucketed join DOES shuffle both sides (sanity
      // that the assertion means something)
      val unbucketed = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey")
      assert(!BucketedTables.isShuffleFree(unbucketed))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
