package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(values: Seq[String]) =
    spark.createDataset(values).toDF("v")
      .select(xxhash64(col("v")).as("h")).as[java.lang.Long]

  test("exact regime: below capacity the sketch IS the distinct hash set") {
    val vals = (1 to 200).map(i => s"user${i % 97}") // 97 distinct
    val sk = hashed(vals).select(KmvSketch.sketch(256)).head()
    assert(sk.length == 97)
    assert(KmvSketch.estimateDistinct(sk, 256) == 97.0)
    // unsigned-sorted, no duplicates
    sk.sliding(2).foreach { case Array(a, b) =>
      assert(java.lang.Long.compareUnsigned(a, b) < 0)
    }
  }

  test("partitioning invariance: repartitioned input yields the same sketch") {
    val vals = (1 to 5000).map(i => s"item${i % 1234}")
    val a = hashed(vals).select(KmvSketch.sketch(64)).head()
    val b = hashed(vals).repartition(13).select(KmvSketch.sketch(64)).head()
    assert(a.sameElements(b))
  }

  test("approximate regime: NDV estimate within the published ~1/sqrt(k-2) bound") {
    val n = 20000
    val vals = (1 to n).map(i => s"u$i")
    val k = 1024
    val sk = hashed(vals).select(KmvSketch.sketch(k)).head()
    assert(sk.length == k)
    val est = KmvSketch.estimateDistinct(sk, k)
    val relErr = math.abs(est - n) / n
    // 4 sigma of 1/sqrt(k-2) ~ 12.5%
    assert(relErr < 0.125, s"NDV est $est vs $n (relErr $relErr)")
  }

  test("merge of stored sketches equals the sketch of the union") {
    val a = (1 to 800).map(i => s"a$i")
    val b = (400 to 1200).map(i => s"a$i") // overlap 400..800
    val k = 128
    val skA = hashed(a).select(KmvSketch.sketch(k)).head()
    val skB = hashed(b).select(KmvSketch.sketch(k)).head()
    val merged = spark.createDataset(Seq(skA, skB))
      .select(KmvSketch.mergeAggregator(k).toColumn).head()
    val direct = hashed(a ++ b).select(KmvSketch.sketch(k)).head()
    assert(merged.sameElements(direct))
    assert(merged.sameElements(KmvSketch.union(skA, skB, k)))
  }

  test("exact-regime set counts match true intersection and union") {
    val a = (1 to 500).map(i => s"u$i")
    val b = (301 to 900).map(i => s"u$i")
    val k = 1024
    val skA = hashed(a).select(KmvSketch.sketch(k)).head()
    val skB = hashed(b).select(KmvSketch.sketch(k)).head()
    val (ni, nu) = KmvSketch.exactSetCounts(skA, skB, k)
    assert(ni == 200L, s"intersection $ni") // 301..500
    assert(nu == 900L, s"union $nu")
    val (ei, eu, j) = KmvSketch.setEstimates(skA, skB, k)
    assert(ei == 200.0 && eu == 900.0)
    assert(math.abs(j - 200.0 / 900.0) < 1e-12)
  }

  test("approximate regime: theta-cut intersection estimate within 4-sigma") {
    val nA = 30000; val overlap = 10000
    val a = (1 to nA).map(i => s"x$i")
    val b = (nA - overlap + 1 to nA + 20000).map(i => s"x$i")
    val k = 2048
    val skA = hashed(a).select(KmvSketch.sketch(k)).head()
    val skB = hashed(b).select(KmvSketch.sketch(k)).head()
    val (ei, eu, _) = KmvSketch.setEstimates(skA, skB, k)
    // union 50k, intersection 10k; J = 0.2. The J estimator's sigma is
    // ~sqrt(J(1-J)/k) => est intersection sigma ~ union * that ~ 440.
    assert(math.abs(ei - overlap) < 4 * 450, s"intersection est $ei")
    assert(math.abs(eu - 50000) < 0.1 * 50000, s"union est $eu")
  }

  test("kryo serialization prunes first: a partial costs <=k longs on the wire") {
    val k = 64
    val buf = new KmvSketch.KmvBuffer(k)
    (1 to 4 * k - 1).foreach(i => buf.insert(i.toLong * 2654435761L))
    assert(buf.n > k, "buffer should be mid-fill, beyond k entries")
    val kryo = new com.esotericsoftware.kryo.Kryo()
    kryo.setRegistrationRequired(false)
    val baos = new java.io.ByteArrayOutputStream()
    val out = new com.esotericsoftware.kryo.io.Output(baos)
    kryo.writeObject(out, buf)
    out.close()
    val bytes = baos.toByteArray
    // k + n ints + <=k longs + kryo framing — nowhere near 4k*8 bytes
    assert(bytes.length <= k * 8 + 64,
      s"serialized partial is ${bytes.length} B; field-serializing the " +
        s"4k backing array would be ~${4 * k * 8} B")
    val in = new com.esotericsoftware.kryo.io.Input(
      new java.io.ByteArrayInputStream(bytes))
    val back = kryo.readObject(in, classOf[KmvSketch.KmvBuffer])
    assert(back.result().toSeq == buf.result().toSeq)
    // round-tripped buffer keeps working as an aggregation buffer
    back.insert(42L)
    assert(back.result().length <= k)
  }

  test("capacity guards: k=0 aggregator and k<2 estimators are rejected") {
    intercept[IllegalArgumentException] {
      KmvSketch.aggregator(0).zero
    }
    intercept[IllegalArgumentException] {
      KmvSketch.mergeAggregator(0).zero
    }
    intercept[IllegalArgumentException] {
      KmvSketch.estimateDistinct(Array(1L), 1)
    }
    intercept[IllegalArgumentException] {
      KmvSketch.setEstimates(Array(1L), Array(1L), 1)
    }
  }

  test("null hashes are skipped like count(DISTINCT)") {
    val df = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("v")
      .select(when(col("v").isNotNull, xxhash64(col("v"))).as("h"))
      .as[java.lang.Long]
    val sk = df.select(KmvSketch.sketch(16)).head()
    assert(sk.length == 2)
  }
}
