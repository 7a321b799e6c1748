package graft

/** Pins the session-config contract that oracle parity and CDC semantics
  * depend on — a config regression here would break every downstream
  * guarantee while all unit logic still "works". */
class GraftSessionSpec extends SparkSpec {

  test("session contract: UTC, ANSI off, nanos-as-long, sized shuffles, extensions") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    // tolerant casts (Trino-tolerated semantics, SURVEY §2.7-F4)
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    assert(spark.sql("SELECT CAST('nope' AS INT)").head().isNullAt(0))
    // events.parquet TIMESTAMP(NANOS) readable
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .schema("ts").dataType.typeName == "timestamp")
    // shuffle partitions sized to cores, not the 200 default
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 64)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // native functions registered by GraftExtensions
    assert(spark.sql("SELECT cosine_similarity(array(1.0f), array(1.0f))")
      .head().getDouble(0) == 1.0)
    // warehouse redirected away from the cwd
    assert(!spark.conf.get("spark.sql.warehouse.dir").contains("/root/repo"))
  }
}
