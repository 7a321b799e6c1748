package graft

import org.apache.spark.sql.functions._

import graft.ops.ExactQuantiles

/** Distributed-selection quantiles must be BIT-identical to Catalyst's
  * `Percentile` aggregate (and therefore to DuckDB quantile_cont) on
  * every distribution shape — that identity is what lets q99 keep its
  * hash oracle after swapping the implementation.
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  private def viaCatalyst(values: Seq[Long]): Seq[Double] = {
    val df = values.toDF("v")
    df.agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
      .head().getSeq[Double](0)
  }

  private def check(values: Seq[Long], parts: Int = 7): Unit = {
    val got = ExactQuantiles.quantiles(values.toDF("v"), "v", probs, parts)
    val want = viaCatalyst(values)
    assert(got.toSeq == want,
      s"mismatch for n=${values.size}: got ${got.toSeq} want $want")
  }

  test("mostly-unique values (pseudo-random)") {
    check((1 to 5000).map(i => (i * 2654435761L) % 100003L))
  }

  test("heavy duplicates (17 distinct values)") {
    check((1 to 4000).map(i => (i % 17).toLong))
  }

  test("single distinct value") { check(Seq.fill(100)(42L)) }

  test("single row") { check(Seq(7L)) }

  test("two rows exercise every fractional interpolation") {
    check(Seq(10L, 20L))
  }

  test("negative and positive values") {
    check((-2000 to 2000).map(_.toLong), parts = 13)
  }

  test("empty input returns NaN") {
    val got = ExactQuantiles.quantiles(
      Seq.empty[Long].toDF("v"), "v", Seq(0.5))
    assert(got.length == 1 && got(0).isNaN)
  }

  test("more partitions than distinct values") {
    check(Seq(1L, 2L, 3L), parts = 16)
  }

  test("grouped quantiles match per-group Catalyst percentile") {
    val df = (1 to 6000).map { i =>
      (s"g${i % 4}", (i * 2654435761L) % 9973L)
    }.toDF("grp", "v")
    val got = ExactQuantiles.quantilesByGroup(df, "grp", "v", probs, 5)
    val want = df.groupBy($"grp")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, qs) =>
      assert(qs.toSeq == want(g), s"group $g: ${qs.toSeq} vs ${want(g)}")
    }
  }

  test("grouped quantiles: single-row and duplicate-heavy groups") {
    val df = (Seq(("solo", 7L)) ++ (1 to 500).map(i => ("dups", (i % 3).toLong)))
      .toDF("grp", "v")
    val got = ExactQuantiles.quantilesByGroup(df, "grp", "v", probs, 4)
    val want = df.groupBy($"grp")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    got.foreach { case (g, qs) => assert(qs.toSeq == want(g), s"group $g") }
  }

  private def catalystByGroup(df: org.apache.spark.sql.DataFrame)
      : Map[String, Seq[Double]] =
    df.groupBy($"grp")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

  test("hashed many-group path is bit-identical to Catalyst per group") {
    // 1000 groups of varied size/shape, incl. duplicates and singletons
    val df = (1 to 40000).map { i =>
      (s"g${i % 1000}", (i * 2654435761L) % (1 + i % 37) )
    }.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupHashed(df, "grp", "v", probs, partitions = 11)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = catalystByGroup(df)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, qs) =>
      assert(qs == want(g), s"group $g: $qs vs ${want(g)}")
    }
  }

  test("auto path: few groups route to range selection, results identical") {
    val df = (1 to 3000).map { i =>
      (s"g${i % 3}", (i * 48271L) % 7919L)
    }.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupAuto(df, "grp", "v", probs, partitions = 5,
        fewGroupsMax = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = catalystByGroup(df)
    assert(got == want)
  }

  test("auto path: many groups route to the hashed path, results identical") {
    val df = (1 to 9000).map { i =>
      (s"g${i % 300}", (i * 48271L) % 101L)
    }.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupAuto(df, "grp", "v", probs, partitions = 7,
        fewGroupsMax = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = catalystByGroup(df)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, qs) => assert(qs == want(g), s"group $g") }
  }

  test("histogram path is bit-identical to Catalyst per group") {
    val df = (1 to 6000).map { i =>
      (s"g${i % 4}", (i * 2654435761L) % 9973L)
    }.toDF("grp", "v")
    val got = ExactQuantiles.quantilesByGroupHistogram(df, "grp", "v", probs)
    val want = catalystByGroup(df)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, qs) =>
      assert(qs.toSeq == want(g), s"group $g: ${qs.toSeq} vs ${want(g)}")
    }
  }

  test("histogram path: tiny bucket count forces multiple narrowing rounds") {
    // spans 0..99999 with buckets=4 → ~9 halvings... guarded at 8 rounds;
    // use buckets=32 → ⌈log₃₂ 1e5⌉ = 4 rounds, still multi-round
    val df = (1 to 5000).map { i =>
      (s"g${i % 3}", (i * 2654435761L) % 100003L)
    }.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupHistogram(df, "grp", "v", probs, buckets = 32)
    val want = catalystByGroup(df)
    got.foreach { case (g, qs) => assert(qs.toSeq == want(g), s"group $g") }
  }

  test("histogram path: negatives, duplicates, singleton and null keys") {
    val rows: Seq[(String, java.lang.Long)] =
      (1 to 2000).map(i => (s"g${i % 2}",
        java.lang.Long.valueOf((i * 48271L) % 4001L - 2000L))) ++
        Seq(("solo", java.lang.Long.valueOf(-7L))) ++
        (1 to 300).map(i => (null: String, java.lang.Long.valueOf((i % 5).toLong))) ++
        (1 to 100).map(_ => ("dup", java.lang.Long.valueOf(3L)))
    val df = rows.toDF("grp", "v")
    val got = ExactQuantiles.quantilesByGroupHistogram(df, "grp", "v", probs)
    val want = df.groupBy($"grp")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, qs) => assert(qs.toSeq == want(g), s"group $g") }
  }

  test("histogram path ignores null values like Percentile") {
    val rows: Seq[(String, java.lang.Long)] =
      (1 to 200).map(i => (s"g${i % 5}",
        if (i % 7 == 0) null else java.lang.Long.valueOf(i % 11)))
    val df = rows.toDF("grp", "v")
    val got = ExactQuantiles.quantilesByGroupHistogram(df, "grp", "v", probs)
    val want = catalystByGroup(df.filter($"v".isNotNull))
    assert(got.map { case (g, qs) => g -> qs.toSeq } == want)
  }

  test("histogram path survives the full-long-domain split-span case") {
    val rows = Seq(("g", Long.MinValue), ("g", -5L), ("g", 0L),
      ("g", 17L), ("g", Long.MaxValue), ("h", Long.MinValue),
      ("h", Long.MinValue + 1))
    val df = rows.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupHistogram(df, "grp", "v", Seq(0.0, 0.5, 1.0))
    // interpolation at these magnitudes is double-rounded either way;
    // endpoints and the odd-count median are exact values
    assert(got("g")(0) == Long.MinValue.toDouble)
    assert(got("g")(1) == 0.0)
    assert(got("g")(2) == Long.MaxValue.toDouble)
    assert(got("h")(0) == Long.MinValue.toDouble)
  }

  test("hashed path ignores nulls like Percentile") {
    val rows: Seq[(String, java.lang.Long)] =
      (1 to 200).map(i => (s"g${i % 5}",
        if (i % 7 == 0) null else java.lang.Long.valueOf(i % 11))) ++
        Seq(("gnull", null: java.lang.Long))
    val df = rows.toDF("grp", "v")
    val got = ExactQuantiles
      .quantilesByGroupHashed(df, "grp", "v", probs, partitions = 3)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = catalystByGroup(df.filter($"v".isNotNull))
    assert(got == want, "all-null group must vanish, nulls must not count")
  }

  test("maxGroups guard fires with an actionable message before collecting") {
    val df = (1 to 500).map(i => (s"g$i", i.toLong)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.quantilesByGroup(df, "grp", "v", Seq(0.5),
        partitions = 4, maxGroups = 100)
    }
    assert(e.getMessage.contains("quantilesByGroupAuto"),
      s"guard message should point at the Auto router: ${e.getMessage}")
  }

  test("Auto router: few groups -> driver path, many groups -> hashed path, same results") {
    val few = (1 to 300).map(i => (s"g${i % 3}", (i % 37).toLong)).toDF("grp", "v")
    val many = (1 to 300).map(i => (s"g${i % 150}", (i % 37).toLong)).toDF("grp", "v")
    for (df <- Seq(few, many)) {
      val got = ExactQuantiles
        .quantilesByGroupAuto(df, "grp", "v", probs, partitions = 4, fewGroupsMax = 10)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val want = df.filter($"v".isNotNull)
        .groupBy($"grp").agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(got == want)
    }
  }

  test("coarse-histogram entry matches Catalyst percentile in one narrowing round") {
    val rows = (1 to 4000).map(i => (s"g${i % 3}", (i * 37 % 9001).toLong)) ++
      Seq.fill(500)(("g0", 4242L)) // duplicate-heavy spike
    val df = rows.toDF("grp", "v")
    val binW = 128L
    val bins = df.groupBy($"grp", expr(s"v div $binW").as("b"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = ExactQuantiles.quantilesByGroupFromCoarseHistogram(
      df, "grp", "v", probs, bins, binW)
    val want = df.groupBy($"grp")
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.view.mapValues(_.toSeq).toMap == want)
  }

  test("coarse-histogram entry rejects negative-value bins") {
    val df = Seq(("g", -5L), ("g", 3L)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      ExactQuantiles.quantilesByGroupFromCoarseHistogram(
        df, "grp", "v", Seq(0.5), Seq(("g", -1L, 1L), ("g", 0L, 1L)), 8L)
    }
  }
}
