package graft

import graft.functions.SpaceSaving

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~1000/i times. */
  lazy val stream = (1 to 30).flatMap(i => Seq.fill(1000 / i)(s"item$i"))

  test("exact regime: capacity >= distinct items reproduces true counts") {
    val ds = spark.createDataset(scala.util.Random.shuffle(stream))
    val got = ds.select(SpaceSaving.topK(64)).head()
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { h =>
      assert(h.count == trueCounts(h.item) && h.error == 0L,
        s"${h.item}: got ${h.count}±${h.error}, want ${trueCounts(h.item)}")
    }
    assert(got.size == 30)
  }

  test("approximate regime: capacity 8 still surfaces the top items with bounded error") {
    val ds = spark.createDataset(stream).repartition(4) // force partial merges
    val got = ds.select(SpaceSaving.topK(8)).head()
    val items = got.map(_.item).toSet
    // guarantee: any item with freq > N/capacity must be present
    val n = stream.size
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    trueCounts.filter(_._2 > n / 8).keys.foreach(k =>
      assert(items.contains(k), s"missed guaranteed heavy hitter $k"))
    // overestimation only, bounded by recorded error
    got.foreach { h =>
      val t = trueCounts(h.item)
      assert(h.count >= t && h.count - t <= h.error,
        s"${h.item}: ${h.count}±${h.error} vs true $t")
    }
  }
}
