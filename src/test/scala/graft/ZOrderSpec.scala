package graft

import org.apache.spark.sql.functions._

import graft.sinks.{SnapshotTable, ZOrder}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bucket bits (hand-computed Morton codes)") {
    // bits=2, boundaries chosen so bucket(x) = x for x in 0..3
    val bounds = Seq(0.5, 1.5, 2.5)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .withColumn("z",
        ZOrder.zvalue(Seq(col("a") -> bounds, col("b") -> bounds), bits = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bit i of a → position 2i; bit i of b → position 2i+1
    // (a=1,b=0) → z=1 ; (a=0,b=1) → z=2 ; (a=3,b=3) → z=15
    // (a=2,b=1) → a bits {1} → pos 2 = 4, b bits {0} → pos 1 = 2 → 6
    assert(rows == Set((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (3L, 3L, 15L), (2L, 1L, 6L)))
  }

  test("z-order compaction bounds per-file spans in BOTH dimensions") {
    def spans(t: SnapshotTable): (Double, Double) = {
      val perFile = t.read().inputFiles.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
      (perFile.map(_._1).sum.toDouble / perFile.length,
        perFile.map(_._2).sum.toDouble / perFile.length)
    }
    // 64×64 grid, shuffled so pre-compact files span the full domain
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y").orderBy(xxhash64($"x", $"y"))

    val lex = new SnapshotTable(spark, tmpDir("zorder") + "/lex")
    lex.overwrite(grid.repartition(8))
    lex.compact(targetRowsPerFile = 256, clusterBy = Seq($"x", $"y"))
    val (_, lexY) = spans(lex)

    val zed = new SnapshotTable(spark, tmpDir("zorder") + "/zed")
    zed.overwrite(grid.repartition(8))
    zed.compact(targetRowsPerFile = 256, zorderBy = Seq("x", "y"))
    val (zX, zY) = spans(zed)

    assert(zed.read().count() == 64L * 64L)
    // lexicographic: each 256-row file spans ~4 x-values but ALL 64 y-values
    assert(lexY > 40.0, s"expected near-full y spans under clusterBy, got $lexY")
    // z-order: both dimensions bounded well below the domain
    assert(zX < 32.0, s"x span too wide under z-order: $zX")
    assert(zY < 32.0, s"y span too wide under z-order: $zY")
  }

  test("boundary and width validation") {
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq(col("a") -> Seq(1.0)), bits = 2) // wrong bound count
    }
    intercept[IllegalArgumentException] {
      ZOrder.zvalue((1 to 8).map(i => col(s"c$i") -> Seq.fill(255)(0.0)), bits = 8)
    } // 64 bits > long
  }
}
