package graft

import org.apache.spark.sql.functions._

/** Runtime scale-mechanism evidence: the two Spark features the 100 TB
  * story leans on that only show up in a LIVE plan — dynamic partition
  * pruning on a partitioned fact table, and AQE's runtime skew-join
  * split — demonstrated on real data so a config regression (someone
  * turns the flag off, a session builder change drops it) fails CI.
  */
class RuntimeScaleSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = tmpDir("dpp")
    // fact partitioned by the join key's domain (20 partitions on disk)
    (0L until 20000L).map(i => (i, i % 20, i * 3))
      .toDF("id", "part_key", "v")
      .write.partitionBy("part_key").mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // dim key must match the INFERRED partition-column type (int) exactly
    // (a cast on the join key leaves nothing to prune on), and the dim must
    // be FILE-backed: a local Seq collapses Filter(LocalRelation) into a
    // pre-filtered LocalRelation before the PartitionPruning rule looks
    // for a selective filter to derive the runtime subquery from
    (0 until 20).map(i => (i, s"name$i")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // dim broadcasts → its filter is eligible to become a runtime
      // partition filter on the fact scan
      val q = fact.join(dim, $"part_key" === $"k")
        .where($"name".isin("name3", "name7"))
        .groupBy($"part_key".cast("long").as("pk")).agg(sum($"v").as("sv"))
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter on the fact scan:\n$planStr")
      // and it actually prunes: only the 2 selected partitions survive
      val scanned = q.collect().map(_.getLong(0)).sorted
      assert(scanned.toSeq == Seq(3L, 7L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("parquet aggregate pushdown answers count/min/max from footers") {
    // DSv2-only feature: COUNT(*)/MIN/MAX with no filter are answered
    // from parquet footer statistics — zero row reads. At 100 TB this
    // turns full-scan audits (row counts per table, value ranges for
    // zone-map builds) into metadata operations.
    val prevList = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      val path = "/root/testdata/sf0.001/lineitem.parquet"
      val expected = spark.read.parquet(path)
        .agg(count(lit(1)), min($"l_orderkey"), max($"l_orderkey"))
        .as[(Long, Long, Long)].head()
      spark.conf.set("spark.sql.sources.useV1SourceList",
        prevList.split(",").filterNot(_.trim == "parquet").mkString(","))
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val q = spark.read.parquet(path)
        .agg(count(lit(1)).as("n"), min($"l_orderkey").as("lo"),
          max($"l_orderkey").as("hi"))
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.contains("PushedAggregation"),
        s"expected footer-level aggregate pushdown:\n$planStr")
      assert(q.as[(Long, Long, Long)].head() == expected)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevList)
      spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force sort-merge (no broadcast escape hatch) and drop the skew
      // thresholds to test scale: one key carries ~97% of the rows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val hot = (0 until 150000).map(i => (0L, s"payload-$i"))
      val rest = (1 to 100).flatMap(k => (0 until 5).map(i => (k.toLong, s"p$i")))
      val left = (hot ++ rest).toDF("k", "payload").repartition(8)
      val right = (0L to 100L).map(i => (i, s"dim$i")).toDF("k", "name")
        .repartition(8)
      // a GLOBAL aggregate: a groupBy(k) here would REQUIRE the join's
      // hash partitioning and thereby forbid the skew split (splitting a
      // partition breaks the downstream distribution guarantee)
      val joined = left.join(right, "k")
        .agg(sum(length($"payload")).as("bytes"))
      joined.collect() // AQE re-plans DURING execution — must run it
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") ||
             finalPlan.toLowerCase.contains("skewed"),
        s"expected AQE to mark/split the skewed join partition:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    }
  }

  test("runtime bloom filter: selective dim filter reaches the fact side") {
    // InjectRuntimeFilter: when a shuffle join's small side carries a
    // selective filter, Spark builds a bloom filter over its join keys
    // and pushes a might_contain() predicate into the big side's scan —
    // the row-level analog of DPP, and the difference between shuffling
    // 100 TB of fact rows and shuffling only the ~0.1% that can match.
    // Evidence-gated here so a session/config regression fails CI.
    val dir = tmpDir("rbf")
    (0L until 200000L).map(i => (i, i % 1000, i)).toDF("id", "fk", "v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0 until 1000).map(i => (i, s"g${i % 100}")).toDF("k", "grp")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    val appKey =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get(appKey)
    try {
      // no broadcast (runtime filters target shuffle joins) and drop the
      // 10 GB application-side floor so the 200k-row fact qualifies
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(appKey, "0")
      val q = fact.join(dim, $"fk" === $"k").where($"grp" === "g7")
        .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected:\n$p")
      val (sv, n) = q.as[(Long, Long)].head()
      assert(n == 2000L, s"10 dim keys x 200 fact rows each, got $n")
      // exact sum: keys 7,107,...,907; rows i with i%1000 == key
      val expect = (0L until 200000L)
        .filter(i => i % 1000 % 100 == 7).sum
      assert(sv == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set(appKey, prevA)
    }
  }
}
