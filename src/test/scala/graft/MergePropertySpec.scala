package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sinks.SnapshotTable
import graft.sources.Debezium

/** Property tests (SURVEY.md §5 test plan): merge idempotence and
  * latest-per-key correctness over randomized changelogs, via raw
  * ScalaCheck (scalatestplus bridge isn't on the classpath). */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val changelogGen: Gen[List[(Int, Long, String)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 12)
      ts <- Gen.choose(1L, 50L)
      v <- Gen.alphaStr.map(_.take(6))
    } yield (key, ts, v))
  } yield rows

  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("latestPerKey returns exactly the max-(ts,v) row per key") {
    check(Prop.forAll(changelogGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("key", "ts", "v")
        val got = Debezium.latestPerKey(df, Seq("key"), Seq(col("ts"), col("v")))
          .collect().map(r => (r.getInt(0), (r.getLong(1), r.getString(2)))).toMap
        val expected = rows.groupBy(_._1).map { case (k, g) =>
          k -> g.map(r => (r._2, r._3)).max
        }
        got == expected
      }
    })
  }

  test("merge is idempotent and replay-insensitive across batches") {
    check(Prop.forAll(changelogGen) { rows =>
      rows.isEmpty || {
        val (b1, b2) = rows.splitAt(rows.length / 2)
        def runMerges(batches: Seq[Seq[(Int, Long, String)]]): Seq[(Int, Long, String)] = {
          val t = new SnapshotTable(spark, tmpDir("prop") + "/t")
          batches.filter(_.nonEmpty).foreach { b =>
            t.merge(b.toDF("key", "ts", "v"), Seq("key"), Seq(col("ts"), col("v")))
          }
          if (t.exists)
            t.read().collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
              .toSeq.sorted
          else Nil
        }
        // replaying batches (again, in reverse) cannot change final state:
        // identical (ts,v) content per key resolves to the same winner
        runMerges(Seq(b1, b2)) == runMerges(Seq(b1, b2, b2, b1))
      }
    }, n = 6)
  }
}
