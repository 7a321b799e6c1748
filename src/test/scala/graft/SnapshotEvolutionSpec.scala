package graft

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

class SnapshotEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("merge evolves schema additively: new columns appear, old persist") {
    val t = new SnapshotTable(spark, tmpDir("evo") + "/t")
    t.overwrite(Seq((1, "a", 1L)).toDF("id", "v", "ts"))
    // updates carry a NEW column `extra` and DROP `v`
    t.merge(Seq((2, 2L, "x")).toDF("id", "ts", "extra"),
      keys = Seq("id"), orderCols = Seq(col("ts")))
    val got = t.read().orderBy("id")
    assert(got.columns.toSet == Set("id", "v", "ts", "extra"))
    val rows = got.collect()
    assert(rows(0).getAs[String]("v") == "a" && rows(0).getAs[String]("extra") == null)
    assert(rows(1).getAs[String]("v") == null && rows(1).getAs[String]("extra") == "x")
  }

  test("compact reduces file count, preserves rows and history") {
    val t = new SnapshotTable(spark, tmpDir("compact") + "/t")
    t.overwrite(spark.range(10000).toDF("id").repartition(32))
    def parquetFiles(v: Long) =
      t.readVersion(v).inputFiles.length
    assert(parquetFiles(1) > 8)
    val v2 = t.compact(targetRowsPerFile = 10000)
    assert(v2 == 2 && parquetFiles(2) == 1)
    assert(t.read().count() == 10000)
    assert(t.readVersion(1).count() == 10000) // history intact
  }

  test("compact with clusterBy yields non-overlapping per-file key ranges") {
    val t = new SnapshotTable(spark, tmpDir("cluster") + "/t")
    // shuffled ids so the pre-compact layout has full-range files
    t.overwrite(spark.range(10000).toDF("id")
      .orderBy(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("id")))
      .repartition(8))
    t.compact(targetRowsPerFile = 2500,
      clusterBy = Seq(org.apache.spark.sql.functions.col("id")))
    val files = t.read().inputFiles
    assert(files.length >= 3, s"expected several clustered files, got ${files.length}")
    // every file must cover a narrow, pairwise non-overlapping id range —
    // that is the property parquet min/max skipping feeds on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
      case _ =>
    }
    assert(t.read().count() == 10000)
  }

  test("expireSnapshots keeps newest N, never the published one") {
    val t = new SnapshotTable(spark, tmpDir("expire") + "/t")
    (1 to 4).foreach(i => t.overwrite(Seq(i).toDF("x")))
    t.expireSnapshots(retain = 2)
    assert(t.read().head().getInt(0) == 4)
    assert(t.readVersion(3).count() == 1)
    intercept[Exception] { t.readVersion(1).count() }
    intercept[Exception] { t.readVersion(2).count() }
  }

  test("runParallel produces the same lake as sequential run") {
    import graft.fixtures.Fixtures
    import graft.pipeline.ProviderPipeline
    def mkLake(root: String, parallel: Boolean): Long = {
      val provPath = s"$root/topics/provider.jsonl"
      val sitePath = s"$root/topics/care_site.jsonl"
      val csvPath = s"$root/dropzone/providers.csv"
      Fixtures.providerCdcJsonl(provPath, n = 30)
      java.nio.file.Files.write(java.nio.file.Paths.get(sitePath),
        Fixtures.careSites.map { case (i, nm, v) =>
          Fixtures.envelope(Some(
            s"""{"care_site_id": $i, "care_site_name": "$nm", "care_site_source_value": "$v"}"""),
            "c", 1757700000000L + i, table = "care_site")
        }.mkString("\n").getBytes("UTF-8"))
      Fixtures.writeSampleCsv(csvPath)
      val p = ProviderPipeline.build(spark,
        ProviderPipeline.Config(provPath, sitePath, csvPath, s"$root/lake"))
      val r = if (parallel) p.runParallel(spark, 3, _ => ()) else p.run(spark, _ => ())
      assert(r.ok, r.stages.map(s => s"${s.name}:${s.error}").mkString(";"))
      assert(r.stages.length == 5)
      spark.read.parquet(s"$root/lake/curated/provider/snapshot=1")
        .selectExpr("sum(hash(provider_id, provider_name, care_site_id))")
        .head().getLong(0)
    }
    val seqHash = mkLake(tmpDir("seq"), parallel = false)
    val parHash = mkLake(tmpDir("par"), parallel = true)
    assert(seqHash == parHash)
  }
}
