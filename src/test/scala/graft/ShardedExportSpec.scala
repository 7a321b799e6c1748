package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ShardedExport

class ShardedExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (1 to n)
    .map(i => (i.toLong, s"doc body $i " * (1 + i % 7), (10 + i % 90).toLong))
    .toDF("doc_id", "text", "n_tokens")

  test("round-trip: shards union back to the input; one file per shard") {
    val dir = Files.createTempDirectory("shardex").toString
    val df = corpus(500)
    val manifest = ShardedExport.write(df, dir, 8, "doc_id", "n_tokens",
      seed = "t1")
    val back = spark.read.option("basePath", dir).parquet(dir)
    assert(back.count() == 500)
    assert(back.select($"doc_id", $"text", $"n_tokens").except(df).isEmpty)
    assert(df.except(back.select($"doc_id", $"text", $"n_tokens")).isEmpty)
    // every shard directory holds exactly one parquet file
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == manifest.count())
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("manifest matches the written files and the JSON twin") {
    val dir = Files.createTempDirectory("shardex").toString
    val m = ShardedExport.write(corpus(300), dir, 4, "doc_id", "n_tokens",
      seed = "t2").collect()
    val fromFiles = spark.read.option("basePath", dir).parquet(dir)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"))
      .orderBy($"shard").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      fromFiles.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_MANIFEST.json")), "UTF-8")
    m.foreach { r =>
      assert(json.contains(
        s"""{"shard":${r.getLong(0)},"n_rows":${r.getLong(1)},"sum_tokens":${r.getLong(2)}}"""))
    }
  }

  test("assignment is deterministic and seed-sensitive") {
    val df = corpus(200)
    val a = df.select($"doc_id",
      ShardedExport.shardOf($"doc_id", 8, "s1").as("sh")).collect()
    val b = df.select($"doc_id",
      ShardedExport.shardOf($"doc_id", 8, "s1").as("sh")).collect()
    val c = df.select($"doc_id",
      ShardedExport.shardOf($"doc_id", 8, "s2").as("sh")).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq !=
      c.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("hash balance: no shard is empty or dominant at 2000 docs / 8 shards") {
    val counts = corpus(2000)
      .select(ShardedExport.shardOf($"doc_id", 8, "bal").as("sh"))
      .groupBy($"sh").count().collect().map(_.getLong(1))
    assert(counts.length == 8)
    // E=250 per shard; 3σ ≈ 45 — generous fixed band, deterministic data
    assert(counts.min > 150 && counts.max < 350,
      s"imbalanced: ${counts.toSeq}")
  }

  test("multi-file mode shuffles nothing and still partitions correctly") {
    val dir = Files.createTempDirectory("shardex").toString
    val df = corpus(400).repartition(6)
    ShardedExport.write(df, dir, 4, "doc_id", "n_tokens", seed = "t3",
      singleFilePerShard = false)
    val back = spark.read.option("basePath", dir).parquet(dir)
    assert(back.count() == 400)
    // rows carry the shard their id hashes to
    val wrong = back.where($"shard".cast("long") =!=
      ShardedExport.shardOf($"doc_id", 4, "t3")).count()
    assert(wrong == 0)
  }
}
