package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.sources.CsvSource

class CsvSourceSpec extends SparkSpec {

  test("malformed rows quarantine verbatim; clean rows parse typed") {
    val dir = tmpDir("csvq")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    Files.write(Paths.get(s"$dir/drop.csv"),
      ("""id,name,score
         |1,alice,9.5
         |2,"unterminated quote,7.1
         |3,bob,8.0
         |""".stripMargin).getBytes("UTF-8"))
    val load = CsvSource.readWithQuarantine(spark, s"$dir/drop.csv", schema)
    val clean = load.clean.collect().map(r => (r.getInt(0), r.getString(1)))
    assert(clean.toSet == Set((1, "alice"), (3, "bob")))
    val q = load.quarantine.collect().map(_.getString(0))
    assert(q.length == 1 && q(0).contains("unterminated"))
  }

  test("wrong-arity rows with unparsable cells quarantine, not null-poison") {
    val dir = tmpDir("csvq2")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", IntegerType)))
    Files.write(Paths.get(s"$dir/drop.csv"),
      "id,v\n1,10\nnot-a-number,oops,extra\n2,20\n".getBytes("UTF-8"))
    val load = CsvSource.readWithQuarantine(spark, s"$dir/drop.csv", schema)
    assert(load.clean.count() == 2)
    assert(load.quarantine.count() == 1)
  }
}
