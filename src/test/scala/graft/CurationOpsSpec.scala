package graft

import org.apache.spark.sql.functions._

import graft.ops.CurationOps

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics count duplicate and top grams exactly") {
    val docs = Seq(
      (1L, "a b a b a"),           // 2-grams: ab ba ab ba -> total 4, distinct 2, top 2
      (2L, "x y z"),               // xy yz -> total 2, distinct 2, top 1
      (3L, "w"),                   // < k tokens -> the single normalized text
      (4L, "")                     // empty -> one empty gram
    ).toDF("doc_id", "text")
    val m = CurationOps.repetitionMetrics(docs, "text", "doc_id", n = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"total_grams", $"distinct_grams", $"top_gram_count",
        round($"dup_gram_frac", 4).as("df"), round($"top_gram_frac", 4).as("tf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(m(0) === ((1L, 4L, 2L, 2L, 0.5, 0.5)))
    assert(m(1) === ((2L, 2L, 2L, 1L, 0.0, 0.5)))
    assert(m(2) === ((3L, 1L, 1L, 1L, 0.0, 1.0)))
    assert(m(3) === ((4L, 1L, 1L, 1L, 0.0, 1.0)))
  }

  /** 3 domains with very skewed sizes; alpha=0.5 should temper shares. */
  lazy val skewedCorpus = {
    val rows = (1 to 9000).map(i => (i.toLong, "big")) ++
      (9001 to 9900).map(i => (i.toLong, "mid")) ++
      (9901 to 10000).map(i => (i.toLong, "small"))
    rows.toDF("doc_id", "domain")
  }

  test("temperature sample is deterministic and hits the target rate") {
    val s1 = CurationOps.temperatureSample(skewedCorpus, "domain", "doc_id",
      alpha = 0.5, targetFraction = 0.3)
    val s2 = CurationOps.temperatureSample(skewedCorpus, "domain", "doc_id",
      alpha = 0.5, targetFraction = 0.3)
    val ids1 = s1.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // expected total ~3000; md5 uniformity gives a tight band at n=10000
    assert(math.abs(ids1.size - 3000) < 300, s"kept ${ids1.size}")
  }

  test("budgetMix hits token budgets, takes under-budget sources whole") {
    // weights ~100/doc: big has 900k mass, mid 90k, small 10k
    val corpus = skewedCorpus.withColumn("tokens",
      lit(80L) + (col("doc_id") % 41))
    val kept = CurationOps.budgetMix(corpus, "domain", "doc_id", "tokens",
      budgets = Map("big" -> 90000L, "small" -> 1000000L))
    val bySource = kept.groupBy($"domain")
      .agg(sum($"tokens").as("mass"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // capped source: kept mass concentrates on the budget (±10%)
    val (bigMass, _) = bySource("big")
    assert(math.abs(bigMass - 90000L) < 9000L, s"big mass $bigMass")
    // over-granted budget: the whole source survives
    assert(bySource("small")._2 == 100L)
    // unbudgeted source is excluded
    assert(!bySource.contains("mid"))
    // deterministic: same call, same kept set
    val again = CurationOps.budgetMix(corpus, "domain", "doc_id", "tokens",
      budgets = Map("big" -> 90000L, "small" -> 1000000L))
    assert(kept.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      again.select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("alpha=0.5 up-samples small domains vs proportional") {
    val kept = CurationOps.temperatureSample(skewedCorpus, "domain", "doc_id",
        alpha = 0.5, targetFraction = 0.3)
      .groupBy($"domain").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // proportional would keep ~30 of 'small'; tempering must beat that by a lot
    assert(kept("small") > 60, s"small kept ${kept("small")}")
    // and the big domain must be down-sampled below its proportional share
    assert(kept("big") < 9000 * 0.3, s"big kept ${kept("big")}")
    // rate is capped at 1: no domain exceeds its size
    assert(kept.values.sum < 10000)
  }

  test("alpha=1 is proportional sampling (same rate every domain)") {
    val kept = CurationOps.temperatureSample(skewedCorpus, "domain", "doc_id",
        alpha = 1.0, targetFraction = 0.5)
      .groupBy($"domain").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("big") / 9000.0 - 0.5) < 0.05)
    assert(math.abs(kept("mid") / 900.0 - 0.5) < 0.1)
  }

  test("epoch shuffle preserves rows, sorts within shards, varies by epoch") {
    val docs = (1L to 2000L).toDF("doc_id")
    val e7 = CurationOps.epochShuffle(docs, "doc_id", epoch = 7, numShards = 8)

    // exactly-once row preservation
    assert(e7.select($"doc_id").distinct().count() === 2000L)

    // within every partition rows are sorted by shuffle_key, and each
    // partition holds whole shards only
    val parts = e7.select($"shard", $"shuffle_key")
      .rdd.mapPartitions { it =>
        val rows = it.toVector
        val keys = rows.map(_.getString(1))
        Iterator.single((keys == keys.sorted, rows.map(_.getInt(0)).toSet.size))
      }.collect()
    assert(parts.forall(_._1), "some partition not sorted by shuffle_key")

    // shards are roughly balanced (md5-keyed hash: tight at n=2000)
    val sizes = e7.groupBy($"shard").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.length === 8 && sizes.forall(n => n > 150 && n < 350),
      s"unbalanced shards: ${sizes.mkString(",")}")

    // same epoch reproduces the identical order; another epoch permutes
    def order(epoch: Int): Seq[Long] =
      CurationOps.epochShuffle(docs, "doc_id", epoch, numShards = 8)
        .orderBy($"shuffle_key").select($"doc_id")
        .collect().map(_.getLong(0)).toSeq
    val o7 = order(7)
    assert(o7 === order(7))
    assert(o7 !== order(8))
    assert(o7.sorted === (1L to 2000L))
  }

  test("seededSample: deterministic, partitioning-invariant, near-rate") {
    val docs = (1L to 5000L).toDF("id")
    def ids(df: org.apache.spark.sql.DataFrame) =
      CurationOps.seededSample(df, "id", rate = 0.2, seed = "s")
        .collect().map(_.getLong(0)).toSet
    val a = ids(docs.repartition(1))
    val b = ids(docs.repartition(17))
    assert(a === b)
    assert(a.size > 800 && a.size < 1200, s"rate off: ${a.size}/5000")
    // a different seed draws a different (deterministic) sample
    val c = CurationOps.seededSample(docs, "id", 0.2, seed = "t")
      .collect().map(_.getLong(0)).toSet
    assert(c !== a)
    // HT expansion uses the exact threshold probability
    assert(math.abs(CurationOps.inverseRate(0.5) - 2.0) < 1e-9)
  }

  test("hashSplit: exhaustive, near-fraction, stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 2000L).toDF("id")
    val out = CurationOps.hashSplit(small, "id", splits, seed = "s")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row in exactly one split
    assert(out.values.sum == 2000L)
    assert(math.abs(out("train") / 2000.0 - 0.8) < 0.03)
    assert(math.abs(out("val") / 2000.0 - 0.1) < 0.02)
    assert(math.abs(out("test") / 2000.0 - 0.1) < 0.02)
    // growth stability: the same ids keep their split when the corpus grows
    val grown = CurationOps.hashSplit((1L to 4000L).toDF("id"), "id", splits, seed = "s")
    val before = CurationOps.hashSplit(small, "id", splits, seed = "s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.filter($"id" <= 2000L).collect()
      .foreach(r => assert(before(r.getLong(0)) == r.getString(1)))
  }

  test("hashSplit: thresholds are cumulative and validation rejects bad specs") {
    assert(CurationOps.splitThresholdsHex(
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)) ==
      Seq("80000000", "c0000000"))
    intercept[IllegalArgumentException] {
      CurationOps.hashSplit(Seq(1L).toDF("id"), "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      CurationOps.hashSplit(Seq(1L).toDF("id"), "id", Seq("a" -> 1.0))
    }
  }

  test("hashSplit: two-way split and no shuffle in the plan") {
    val df = CurationOps.hashSplit(
      (1L to 100L).toDF("id"), "id", Seq("train" -> 0.9, "test" -> 0.1))
    assert(!df.queryExecution.executedPlan.toString.toLowerCase.contains("exchange"))
    assert(df.groupBy("split").count().count() == 2)
  }

  test("assignStableIds enumerates in key order, invariant to partition count") {
    val df = Seq(30L, 5L, 99L, 1L, 42L, 7L).toDF("key")
      .withColumn("payload", $"key" * 10)
    def ids(parts: Int) = CurationOps.assignStableIds(df, "key", partitions = parts)
      .select($"key", $"stable_id").as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 0L, 5L -> 1L, 7L -> 2L, 30L -> 3L,
      42L -> 4L, 99L -> 5L)
    assert(ids(1) == expected && ids(3) == expected && ids(7) == expected)
  }

  test("filterFunnel attributes each row to its FIRST failing stage") {
    val docs = Seq(
      (1L, "fr", 10L),  // fails stage 1 (and would fail 2 — attributed to 1)
      (2L, "en", 10L),  // passes 1, fails 2
      (3L, "en", 50L),  // kept
      (4L, "en", 50L),  // kept
      (5L, "de", 99L)   // fails 1
    ).toDF("id", "lang", "len")
    val got = CurationOps.filterFunnel(docs, Seq(
        "1_lang" -> ($"lang" === "en"),
        "2_len" -> ($"len" >= 20L),
        "3_never_fires" -> lit(true)))
      .orderBy($"stage").as[(String, Long)].collect().toSeq
    // zero-drop stages still present, kept rows counted once
    assert(got == Seq("1_lang" -> 2L, "2_len" -> 1L,
      "3_never_fires" -> 0L, "kept" -> 2L))
  }

  test("weightedSample: exactly k per stratum, deterministic, weight-sensitive") {
    val n = 400
    val docs = (1 to n).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
       if (i <= 4) 100000L else 1L)     // ids 1..4 carry crushing weight
    }.toDF("id", "src", "w")
    val s1 = CurationOps.weightedSample(docs, "src", "id", "w", k = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(s1.count(_._2 == "a") == 10 && s1.count(_._2 == "b") == 10)
    val s2 = CurationOps.weightedSample(docs, "src", "id", "w", k = 10)
      .collect().toSeq
    assert(s1.map(r => (r._1, r._2, r._3)).toSet ==
      s2.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet,
      "same seed, same sample")
    // the 1e5-weight rows win their stratum's draw essentially surely
    val heavy = s1.filter(_._1 <= 4).map(_._1).toSet
    assert(heavy == Set(1L, 2L, 3L, 4L),
      s"heavyweights must be sampled, got $heavy")
    // a different seed moves the lightweight tail
    val s3 = CurationOps.weightedSample(docs, "src", "id", "w", k = 10,
      seed = "other").as[(Long, String, Long)].collect().toSeq
    assert(s3.map(_._1).toSet != s1.map(_._1).toSet, "seed varies the draw")
  }

  test("weightedSample matches a sequential A-ES reference draw exactly") {
    // tiny stratum: recompute the Spark md5-keys in Scala and take top-k —
    // the kept set must be the k largest ln(u)/w keys
    val docs = Seq((1L, 5L), (2L, 1L), (3L, 50L), (4L, 2L), (5L, 8L))
      .map { case (i, w) => (i, "s", w) }.toDF("id", "src", "w")
    val got = CurationOps.weightedSample(docs, "src", "id", "w", k = 2)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val v = java.lang.Long.parseLong(hex, 16)
      math.log((v.toDouble + 0.5) / 1152921504606846976.0) / w.toDouble
    }
    val want = Seq((1L, 5L), (2L, 1L), (3L, 50L), (4L, 2L), (5L, 8L))
      .sortBy { case (i, w) => -key(i, w) }.take(2).map(_._1).toSet
    assert(got == want)
  }
}
