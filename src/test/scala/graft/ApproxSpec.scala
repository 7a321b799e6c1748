package graft

import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; approx median within 5% of exact") {
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.agg(
      countDistinct($"l_orderkey").as("d"),
      expr("percentile(l_extendedprice, 0.5)").as("med")).head()
    val approx = li.agg(
      approx_count_distinct($"l_orderkey").as("d"),
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("med")).head()
    val dErr = math.abs(approx.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0)
    val mErr = math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1)
    info(f"distinct err=$dErr%.4f median err=$mErr%.4f")
    assert(dErr < 0.05 && mErr < 0.05)
  }
}
