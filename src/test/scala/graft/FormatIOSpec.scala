package graft

import org.apache.spark.sql.functions._

import graft.sources.FormatIO

class FormatIOSpec extends SparkSpec {
  import spark.implicits._

  lazy val data = (1 to 500).map(i =>
    (i.toLong, s"name-$i", i * 1.5, i % 7 == 0)).toDF("id", "name", "v", "flag")

  test("every supported format round-trips the identical frame") {
    val root = tmpDir("formats")
    Seq("parquet", "orc", "jsonl", "csv").foreach { f =>
      FormatIO.write(data, f, s"$root/$f")
      val back = FormatIO.read(spark, f, s"$root/$f", data.schema)
      val got = back.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      val want = data.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      assert(got == want, s"round-trip mismatch for $f")
    }
  }

  test("ORC scans prune columns and push filters like parquet") {
    val root = tmpDir("orc-prune")
    FormatIO.write(data, "orc", s"$root/t")
    val df = FormatIO.read(spark, "orc", s"$root/t", data.schema)
      .filter($"id" > 400).select("name")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(id,400)"),
      s"filter not pushed into ORC scan:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("flag"),
      s"column pruning failed for ORC:\n$p")
    assert(df.count() == 100)
  }

  test("partitioned write prunes directories on read") {
    val root = tmpDir("fmt-part")
    FormatIO.write(data.withColumn("bucket", ($"id" % 4).cast("int")),
      "orc", s"$root/t", partitionBy = Seq("bucket"))
    val df = spark.read.orc(s"$root/t").filter($"bucket" === 2)
    // the scan must carry the predicate as a PARTITION filter (directory
    // pruning at planning time), not a data filter
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("(bucket"),
      s"partition pruning missing from scan:\n$p")
    assert(df.count() == 125)
  }

  test("unknown formats are rejected eagerly") {
    intercept[IllegalArgumentException] {
      FormatIO.write(data, "avro", tmpDir("nope"))
    }
  }
}
