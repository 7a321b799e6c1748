package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewOps

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  /** 90% of rows share one hot key. */
  lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) i.toLong else 1L, i.toDouble)
  }.toDF("key", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"key")
      .agg(round(sum($"v"), 4).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewOps.saltedAgg(skewed, Seq("key"), salts = 8,
      partialAggs = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
      mergeAggs = Seq(round(sum($"ps"), 4).as("s"), sum($"pn").as("n")))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join, including left-outer misses") {
    val dim = Seq((1L, "hot"), (10L, "ten")).toDF("key", "name")
    val plain = skewed.join(dim, Seq("key"), "left")
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    val salted = SkewOps.saltedBroadcastJoin(skewed, dim, "key", salts = 8, "left")
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(salted == plain)
    assert(plain(Some("hot")) == 9000)
  }

  test("salt spreads the hot key across shards") {
    val shardSizes = skewed.filter($"key" === 1L)
      .withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .groupBy($"__salt").count().collect().map(_.getLong(1))
    assert(shardSizes.length == 8)
    assert(shardSizes.max < 9000 * 0.5, s"shards: ${shardSizes.toSeq}")
  }
}
