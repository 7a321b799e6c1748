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
}
