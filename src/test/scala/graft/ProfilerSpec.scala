package graft

import graft.checks.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profiler captures nulls, distincts, bounds, means in one pass") {
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val p = Profiler.profile(li).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.size == li.schema.fields.length)
    val qty = p("l_quantity")
    assert(qty.getAs[Long]("n_nulls") == 0)
    assert(qty.getAs[String]("min").toDouble == 1.0)
    assert(qty.getAs[String]("max").toDouble == 50.0)
    assert(qty.getAs[String]("mean").toDouble > 20.0)
    val rf = p("l_returnflag")
    assert(rf.getAs[Long]("approx_distinct") == 3) // A/N/R, exact at this card
    assert(rf.getAs[String]("mean") == null) // strings have no mean
  }

  test("rollback repoints to an old snapshot; versioned views pin history") {
    val t = new graft.sinks.SnapshotTable(spark, tmpDir("rb") + "/t")
    t.overwrite(Seq(1).toDF("x"))
    t.overwrite(Seq(2).toDF("x"))
    assert(t.read().head().getInt(0) == 2)
    t.rollback(1)
    assert(t.read().head().getInt(0) == 1)
    val cat = new graft.catalog.GraftCatalog(spark,
      new java.io.File(tmpDir("rb2")).toString)
    cat.table("s", "t").overwrite(Seq(10).toDF("x"))
    cat.table("s", "t").overwrite(Seq(20).toDF("x"))
    val v1 = cat.registerVersion("s", "t", 1)
    assert(cat.sql(s"SELECT x FROM $v1").head().getInt(0) == 10)
  }
}
