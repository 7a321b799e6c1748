package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (hand-checked + magic == per-bit form)") {
    // x=3 (bits 0,1 -> z bits 0,2), y=1 (bit 0 -> z bit 1): z = 0b0111
    val hand = Seq((3L, 1L)).toDF("x", "y")
      .select(LayoutOps.zValue2(col("x"), col("y"))).head().getLong(0)
    assert(hand == 7L)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
    val magic = df.select(LayoutOps.zValue2(col("x"), col("y"))).collect().map(_.getLong(0))
    val perBit = df.select(LayoutOps.zValueN(Seq(col("x"), col("y")), 16))
      .collect().map(_.getLong(0))
    assert(magic.toSeq == perBit.toSeq)
  }

  test("zValueN handles 3 dimensions and rejects invalid shapes") {
    // x=1,y=1,z=1 with d=3: bits 0,1,2 set -> 7
    val v = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(LayoutOps.zValueN(Seq(col("a"), col("b"), col("c")), 4))
      .head().getLong(0)
    assert(v == 7L)
    intercept[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(col("a")), 16)
    }
    intercept[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("scaleToGrid maps bounds to grid extremes, exactly and monotonically") {
    val df = Seq(100L, 150L, 200L).toDF("v")
      .select(LayoutOps.scaleToGrid(col("v"), lit(100L), lit(200L)).as("g"))
    val g = df.collect().map(_.getLong(0))
    assert(g(0) == 0L && g(2) == 65535L && g(1) > 0L && g(1) < 65535L)
    // degenerate column: everything lands in cell 0
    val d = Seq(5L).toDF("v")
      .select(LayoutOps.scaleToGrid(col("v"), lit(5L), lit(5L))).head().getLong(0)
    assert(d == 0L)
  }

  test("z-ordered layout prunes on BOTH columns; linear only on its sort key") {
    // two independent uniform dimensions, deterministic from the id
    val n = 20000
    val df = spark.range(n.toLong).select(
      (xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("a"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear").toString
    LayoutOps.writeZOrdered(df, "a", "b", zDir, numFiles = 16)
    LayoutOps.writeLinearOrdered(df, "a", lDir, numFiles = 16)
    // clustering must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() == n)

    // a selective box on the NON-sort column b: the a-sorted layout has
    // b uniform in every file (all files overlap); the z-ordered layout
    // confines each b-range to a subset of files
    val bBox = Map("b" -> (0L, 12000L))
    val (zB, zTot) = LayoutOps.filesOverlappingBox(spark, zDir, bBox)
    val (lB, lTot) = LayoutOps.filesOverlappingBox(spark, lDir, bBox)
    assert(zTot == 16 && lTot == 16)
    assert(lB == 16, s"control: linear layout should not prune on b (got $lB)")
    assert(zB <= 8, s"z-order should skip at least half the files on b (got $zB)")

    // a 2-D box prunes harder still
    val box2 = Map("a" -> (0L, 12000L), "b" -> (0L, 12000L))
    val (z2, _) = LayoutOps.filesOverlappingBox(spark, zDir, box2)
    assert(z2 <= 4, s"2-D box should touch <= 4 of 16 z-ordered files (got $z2)")

    // and Spark pushes the box predicate into the parquet scan, so the
    // footer stats this layout tightens are what the scan prunes with
    val scan = spark.read.parquet(zDir)
      .filter(col("a") <= 12000L && col("b") <= 12000L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(a,12000)"),
      s"box predicate not pushed to scan:\n$plan")
  }

  test("3-column z-order prunes files on EVERY interleaved column") {
    // three independent uniform dimensions; the single-column sort twin
    // proves the pruning comes from the interleave, not the data
    val n = 20000
    val df = spark.range(n.toLong).select(
      (xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("a"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("b"),
      (xxhash64(col("id"), lit(2)).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("c"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder3").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear3").toString
    LayoutOps.writeZOrdered(df, Seq("a", "b", "c"), zDir, numFiles = 64)
    LayoutOps.writeLinearOrdered(df, "a", lDir, numFiles = 64)
    assert(spark.read.parquet(zDir).count() == n)
    // a selective box on each NON-leading dimension: the a-sorted layout
    // cannot prune there; the 3-D interleave must on all three
    Seq("a", "b", "c").foreach { c =>
      val box = Map(c -> (0L, 10000L))
      val (zHit, zTot) = LayoutOps.filesOverlappingBox(spark, zDir, box)
      assert(zTot == 64, s"$c: $zTot files")
      assert(zHit * 2 <= zTot,
        s"z-order should skip >= half the files on $c (got $zHit/$zTot)")
      if (c != "a") {
        val (lHit, lTot) = LayoutOps.filesOverlappingBox(spark, lDir, box)
        assert(lHit == lTot,
          s"control: linear layout should not prune on $c (got $lHit/$lTot)")
      }
    }
    // the 3-D box compounds the pruning
    val box3 = Map("a" -> (0L, 10000L), "b" -> (0L, 10000L), "c" -> (0L, 10000L))
    val (z3, _) = LayoutOps.filesOverlappingBox(spark, zDir, box3)
    assert(z3 <= 8, s"3-D box should touch <= 8 of 64 files (got $z3)")
  }

  test("FileZoneMap over a z-ordered table prunes candidates on BOTH columns") {
    val df = spark.range(20000L).select(
      (xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("a"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(0x7FFFFFFFL)) % 100000L).as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder-zm").toString
    val idx = java.nio.file.Files.createTempDirectory("zorder-idx").toString
    graft.ops.LayoutOps.writeZOrdered(df, "a", "b", zDir, numFiles = 16)
    graft.sinks.FileZoneMap.build(spark, zDir, Seq("a", "b"), idx)
    // a selective range on EITHER interleaved column admits a file subset
    // — the layout is what makes the zone map useful on both dimensions
    val candA = graft.sinks.FileZoneMap.candidateFiles(spark, idx, "a", 0L, 9999L)
    val candB = graft.sinks.FileZoneMap.candidateFiles(spark, idx, "b", 0L, 9999L)
    assert(candA.size <= 8, s"zone map should prune on a (got ${candA.size}/16)")
    assert(candB.size <= 8, s"zone map should prune on b (got ${candB.size}/16)")
    // and the pruned read is answer-identical to the full-table predicate
    val viaIndex = graft.sinks.FileZoneMap
      .rangeLookup(spark, zDir, idx, "b", 0L, 9999L)
      .agg(count(lit(1)).as("n"), sum(col("a")).as("s")).head()
    val direct = spark.read.parquet(zDir)
      .filter(col("b") >= 0L && col("b") <= 9999L)
      .agg(count(lit(1)).as("n"), sum(col("a")).as("s")).head()
    assert(viaIndex == direct)
  }
}
