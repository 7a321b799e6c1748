package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKRewrite optimizer rule: naive `row_number() <= k` window
  * queries must plan as bounded-heap aggregates (no Window, no full
  * sort), produce results identical to the un-rewritten plan, and leave
  * every ineligible shape untouched.
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  // unique order key (v) → total order → results comparable row-for-row
  lazy val data = (1 to 5000).map { i =>
    (i % 40L, (i * 2654435761L) % 1000003L, s"p$i")
  }.toDF("key", "v", "payload")

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def naiveTopK(desc: Boolean, k: Int): DataFrame = {
    val ord = if (desc) $"v".desc else $"v".asc
    data.withColumn("rn",
        row_number().over(Window.partitionBy($"key").orderBy(ord)))
      .filter($"rn" <= k)
  }

  private def withRuleDisabled[T](f: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.TopKRewrite")
    try f finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def collectSet(df: DataFrame): Set[(Long, Long, String, Int)] =
    df.select($"key", $"v", $"payload", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet

  test("descending top-k rewrites to a heap aggregate, results identical") {
    val df = naiveTopK(desc = true, k = 3)
    val p = physical(df)
    assert(!p.contains("Window"), s"window survived:\n$p")
    assert(p.contains("collect_top_k"), s"no heap aggregate:\n$p")
    val want = withRuleDisabled(collectSet(naiveTopK(desc = true, k = 3)))
    assert(collectSet(df) == want)
  }

  test("ascending top-k rewrites and matches") {
    val df = naiveTopK(desc = false, k = 5)
    assert(!physical(df).contains("Window"))
    val want = withRuleDisabled(collectSet(naiveTopK(desc = false, k = 5)))
    assert(collectSet(df) == want)
  }

  test("rn = 1 (argmax per key) rewrites") {
    val df = data.withColumn("rn",
        row_number().over(Window.partitionBy($"key").orderBy($"v".desc)))
      .filter($"rn" === 1)
    assert(!physical(df).contains("Window"))
    assert(df.count() == 40)
    // one row per key, and it carries the key's max v
    val maxes = data.groupBy($"key").agg(max($"v").as("mv"))
    assert(df.join(maxes, "key").where($"v" =!= $"mv").count() == 0)
  }

  test("residual conjuncts survive above the rewrite") {
    val df = data.withColumn("rn",
        row_number().over(Window.partitionBy($"key").orderBy($"v".desc)))
      .filter($"rn" <= 4 && $"v" % 2 === 0)
    assert(!physical(df).contains("Window"))
    val want = withRuleDisabled {
      data.withColumn("rn",
          row_number().over(Window.partitionBy($"key").orderBy($"v".desc)))
        .filter($"rn" <= 4 && $"v" % 2 === 0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toSet
    }
    assert(collectSet(df) == want)
  }

  test("SQL-text row_number top-k is rewritten too") {
    data.createOrReplaceTempView("topk_input")
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT key, v, payload,
        |    row_number() OVER (PARTITION BY key ORDER BY v DESC) AS rn
        |  FROM topk_input) WHERE rn <= 2""".stripMargin)
    assert(!physical(df).contains("Window"))
    val want = withRuleDisabled(collectSet(
      naiveTopK(desc = true, k = 2)))
    assert(collectSet(df) == want)
  }

  // tie-heavy data: ~8 rows per (key, v) pair so rank boundaries always
  // split inside a tie group somewhere
  lazy val tied = (1 to 5000).map { i =>
    (i % 40L, (i % 17).toLong, s"p$i")
  }.toDF("key", "v", "payload")

  private def naiveRank(dense: Boolean, desc: Boolean, k: Int): DataFrame = {
    val ord = if (desc) $"v".desc else $"v".asc
    val fn = if (dense) dense_rank() else rank()
    tied.withColumn("rn", fn.over(Window.partitionBy($"key").orderBy(ord)))
      .filter($"rn" <= k)
  }

  test("rank() <= k rewrites tie-aware: boundary ties kept, results identical") {
    val df = naiveRank(dense = false, desc = true, k = 3)
    val p = physical(df)
    assert(!p.contains("Window"), s"window survived:\n$p")
    assert(p.contains("collect_top_rank"), s"no tie-aware heap:\n$p")
    val want = withRuleDisabled(collectSet(naiveRank(dense = false, desc = true, k = 3)))
    assert(collectSet(df) == want)
    // rank<=3 over 17-value ties keeps MORE than 3 rows per key
    assert(df.groupBy($"key").count().where($"count" > 3).count() == 40)
  }

  test("dense_rank() <= k rewrites: first k distinct order values kept") {
    val df = naiveRank(dense = true, desc = false, k = 4)
    val p = physical(df)
    assert(!p.contains("Window") && p.contains("collect_top_rank"))
    val want = withRuleDisabled(collectSet(naiveRank(dense = true, desc = false, k = 4)))
    assert(collectSet(df) == want)
    // exactly the 4 smallest distinct v per key survive
    assert(df.select($"key", $"v").distinct().count() == 40 * 4)
  }

  test("rank family SQL text rewrites too, rank values correct under ties") {
    tied.createOrReplaceTempView("rank_input")
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT key, v, payload,
        |    rank() OVER (PARTITION BY key ORDER BY v) AS rn
        |  FROM rank_input) WHERE rn = 1""".stripMargin)
    assert(!physical(df).contains("Window"))
    val want = withRuleDisabled(spark.sql(
      """SELECT * FROM (
        |  SELECT key, v, payload,
        |    rank() OVER (PARTITION BY key ORDER BY v) AS rn
        |  FROM rank_input) WHERE rn = 1""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet)
    assert(collectSet(df) == want)
  }

  test("property: rank/dense_rank rewrite equals no-rewrite over tie-ful shapes") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 6).foreach { trial =>
      val n = 500 + rnd.nextInt(2000)
      val keys = 1 + rnd.nextInt(20)
      val vals = 2 + rnd.nextInt(10) // few distinct order values → dense ties
      val k = 1 + rnd.nextInt(6)
      val desc = rnd.nextBoolean()
      val dense = rnd.nextBoolean()
      val df = (1 to n).map { i =>
        (i % keys.toLong, ((i * 31 + trial) % vals).toLong, s"p$i")
      }.toDF("key", "v", "payload")
      val ord = if (desc) $"v".desc else $"v".asc
      val fn = if (dense) dense_rank() else rank()
      def run() = df.withColumn("rn",
          fn.over(Window.partitionBy($"key").orderBy(ord)))
        .filter($"rn" <= k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toSet
      val rewritten = run()
      val baseline = withRuleDisabled(run())
      assert(rewritten == baseline,
        s"trial $trial (n=$n keys=$keys vals=$vals k=$k desc=$desc dense=$dense)")
    }
  }

  test("percent_rank / ntile are NOT rewritten") {
    val df = tied.withColumn("pr",
        percent_rank().over(Window.partitionBy($"key").orderBy($"v")))
      .filter($"pr" <= 0.5)
    assert(physical(df).contains("Window"))
    val df2 = tied.withColumn("q",
        ntile(4).over(Window.partitionBy($"key").orderBy($"v")))
      .filter($"q" <= 2)
    assert(physical(df2).contains("Window"))
  }

  test("mixed sort directions are NOT rewritten") {
    val df = data.withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"v".desc, $"payload".asc)))
      .filter($"rn" <= 3)
    assert(physical(df).contains("Window"))
  }

  test("unbounded rank filter (rn >= k) is NOT rewritten") {
    val df = data.withColumn("rn",
        row_number().over(Window.partitionBy($"key").orderBy($"v".desc)))
      .filter($"rn" > 3)
    assert(physical(df).contains("Window"))
  }

  test("property: rewrite equals no-rewrite over randomized shapes") {
    // deterministic pseudo-random sweep: sizes, key counts, k, direction,
    // multi-column partition keys, k larger than every group
    val rnd = new scala.util.Random(20260812L)
    (1 to 8).foreach { trial =>
      val n = 500 + rnd.nextInt(3000)
      val keys = 1 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(12)
      val desc = rnd.nextBoolean()
      val df = (1 to n).map { i =>
        (i % keys.toLong, (i % 7).toLong,
          (i * 2654435761L + trial) % 999983L, s"p$i")
      }.toDF("k1", "k2", "v", "payload")
      val ord = if (desc) $"v".desc else $"v".asc
      def run() = df.withColumn("rn", row_number().over(
          Window.partitionBy($"k1", $"k2").orderBy(ord)))
        .filter($"rn" <= k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getInt(4))).toSet
      val rewritten = run()
      val baseline = withRuleDisabled(run())
      assert(rewritten == baseline,
        s"trial $trial (n=$n keys=$keys k=$k desc=$desc): " +
          s"${(rewritten diff baseline).take(3)} vs ${(baseline diff rewritten).take(3)}")
    }
  }

  test("the rewritten plan has no sort below the aggregate") {
    val df = naiveTopK(desc = true, k = 3)
    // the only acceptable Sort is none at all: heap aggregation replaces
    // both the partial sort and the final sort
    assert(!physical(df).contains("Sort "), physical(df))
  }
}
