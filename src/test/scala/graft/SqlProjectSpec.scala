package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.SqlProject
import graft.sinks.SnapshotTable

class SqlProjectSpec extends SparkSpec {
  import spark.implicits._

  private def writeModel(dir: String, name: String, text: String): Unit =
    Files.write(Paths.get(dir, s"$name.sql"), text.getBytes("UTF-8"))

  private def events = Seq(
    (1L, "p1", "alpha", 100L), (2L, "p1", "alpha-renamed", 200L),
    (3L, "p2", "beta", 150L), (4L, "p3", "gamma", 50L)
  ).toDF("event_id", "provider_id", "provider_name", "event_ts")

  private def sites = Seq(("p1", "siteA"), ("p2", "siteB"), ("p3", "siteC"))
    .toDF("provider_id", "site_name")

  test("parseModel reads config, tests, refs and sources from the header") {
    val m = SqlProject.parseModel("m", """-- graft: materialized=merge unique_key=id order_by=ts
      |-- graft: tags=raw,cdc retries=2
      |-- test: unique id
      |-- test: not_null name severity=warn
      |-- test: relationships site_id sites site_id
      |-- test: freshness ts 86400000
      |select * from {{ ref('base') }} b join {{ source('ext') }} e on b.id = e.id
      |""".stripMargin)
    assert(m.materialized == "merge" && m.uniqueKey == Seq("id") &&
      m.orderBy == Seq("ts") && m.tags == Set("raw", "cdc") && m.retries == 2)
    assert(m.refs == Seq("base") && m.sources == Seq("ext"))
    assert(m.tests.map(_.kind) ==
      Seq("unique", "not_null", "relationships", "freshness"))
    assert(m.tests(1).severity == graft.checks.Checks.Warn)
    intercept[IllegalArgumentException] {
      SqlProject.parseModel("bad", "-- graft: materialized=merge\nselect 1")
    }
  }

  test("a three-model project runs: merge raw, ephemeral view, tested curated") {
    val dir = tmpDir("sqlproj-models"); val lake = tmpDir("sqlproj-lake")
    writeModel(dir, "raw_events",
      """-- graft: materialized=merge unique_key=provider_id order_by=event_ts
        |-- graft: tags=raw
        |-- test: not_null provider_id
        |select provider_id, provider_name, event_ts
        |from {{ source('events') }}""".stripMargin)
    writeModel(dir, "enriched",
      """-- graft: materialized=ephemeral
        |select r.provider_id, r.provider_name, s.site_name
        |from {{ ref('raw_events') }} r
        |join {{ source('sites') }} s on r.provider_id = s.provider_id""".stripMargin)
    writeModel(dir, "curated",
      """-- graft: materialized=table
        |-- test: unique provider_id
        |-- test: not_null site_name
        |-- test: relationships provider_id raw_events provider_id
        |-- test: expression name_nonempty length(provider_name) > 0
        |-- test: row_count_between 1 100
        |select provider_id, provider_name, site_name
        |from {{ ref('enriched') }}""".stripMargin)
    val p = SqlProject.load(spark, dir, lake, Map(
      "events" -> (_ => events), "sites" -> (_ => sites)))
    assert(p.ordered.map(_.name) == Seq("raw_events", "enriched", "curated"))
    val res = p.run(spark, _ => ())
    assert(res.ok, res.toJson)
    // merge kept the LATEST row per provider (event_ts desc)
    val curated = new SnapshotTable(spark, s"$lake/curated").read()
      .orderBy($"provider_id")
      .as[(String, String, String)].collect().toSeq
    assert(curated == Seq(("p1", "alpha-renamed", "siteA"),
      ("p2", "beta", "siteB"), ("p3", "gamma", "siteC")))
    // ephemeral models never materialize
    assert(!new SnapshotTable(spark, s"$lake/enriched").exists)
    // every declared test ran
    assert(res.stages.last.checks.size == 5 &&
      res.stages.last.checks.forall(_.passed))
  }

  test("a failing Error test blocks publication (WAP)") {
    val dir = tmpDir("sqlproj-fail"); val lake = tmpDir("sqlproj-fail-lake")
    writeModel(dir, "dups",
      """-- graft: materialized=table
        |-- test: unique k
        |select x AS k from {{ source('xs') }}""".stripMargin)
    val p = SqlProject.load(spark, dir, lake, Map(
      "xs" -> (s => { import s.implicits._; Seq(1, 1, 2).toDF("x") })))
    val res = p.run(spark, _ => ())
    assert(!res.ok)
    assert(!new SnapshotTable(spark, s"$lake/dups").exists,
      "failed audit must not publish")
  }

  test("parseSources reads the conf format and rejects junk") {
    val srcs = SqlProject.parseSources(
      """# external tables
        |docs parquet /tmp/x.parquet
        |drops csv /tmp/drop.csv
        |""".stripMargin)
    assert(srcs.keySet == Set("docs", "drops"))
    intercept[IllegalArgumentException] {
      SqlProject.parseSources("docs avro /tmp/x")
    }
    intercept[IllegalArgumentException] {
      SqlProject.parseSources("too few")
    }
  }

  test("a file-declared project runs end to end from sources.conf") {
    val dir = tmpDir("sqlproj-conf"); val lake = tmpDir("sqlproj-conf-lake")
    val data = tmpDir("sqlproj-conf-data")
    events.write.parquet(s"$data/events.parquet")
    Files.write(Paths.get(dir, "sources.conf"),
      s"events parquet $data/events.parquet\n".getBytes("UTF-8"))
    writeModel(dir, "latest",
      """-- graft: materialized=merge unique_key=provider_id order_by=event_ts
        |-- test: unique provider_id
        |select provider_id, provider_name, event_ts
        |from {{ source('events') }}""".stripMargin)
    val sources = SqlProject.parseSources(new String(
      Files.readAllBytes(Paths.get(dir, "sources.conf")), "UTF-8"))
    val res = SqlProject.load(spark, dir, lake, sources).run(spark, _ => ())
    assert(res.ok, res.toJson)
    val got = new SnapshotTable(spark, s"$lake/latest").read()
      .orderBy($"provider_id").as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("p1", "alpha-renamed", 200L), ("p2", "beta", 150L),
      ("p3", "gamma", 50L)))
  }

  test("is_incremental blocks drop on first run, filter via {{ this }} after") {
    val dir = tmpDir("sqlproj-incr"); val lake = tmpDir("sqlproj-incr-lake")
    val data = tmpDir("sqlproj-incr-data")
    writeModel(dir, "incr",
      """-- graft: materialized=merge unique_key=event_id order_by=event_ts
        |select event_id, provider_id, event_ts
        |from {{ source('events') }}
        |{% if is_incremental() %}
        |where event_ts > (select max(event_ts) from {{ this }})
        |{% endif %}""".stripMargin)
    def run(df: org.apache.spark.sql.DataFrame) =
      SqlProject.load(spark, dir, lake,
        Map("events" -> (_ => df))).run(spark, _ => ())
    // first run: block dropped, full scan of the 4-row batch
    assert(run(events).ok)
    val t = new SnapshotTable(spark, s"$lake/incr")
    assert(t.read().count() == 4)
    // second run: a LATE row (ts 120 < published max 200) must be
    // excluded by the {{ this }} filter; a new row (ts 300) merges in
    val batch2 = Seq((5L, "p9", 300L), (6L, "p_late", 120L))
      .toDF("event_id", "provider_id", "event_ts")
    assert(run(batch2).ok)
    val ids = t.read().orderBy($"event_id").as[(Long, String, Long)]
      .collect().map(_._1).toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L), "late row must not re-enter")
    // {{ this }} outside an is_incremental block fails fast on first run
    val dir2 = tmpDir("sqlproj-incr-bad")
    writeModel(dir2, "bad",
      "select * from {{ this }}")
    val res = SqlProject.load(spark, dir2, tmpDir("sqlproj-incr-bad-lake"),
      Map.empty).run(spark, _ => ())
    assert(!res.ok && res.stages.head.error.exists(_.contains("is_incremental")))
  }

  test("insert_overwrite replaces exactly the batch's partitions") {
    val dir = tmpDir("sqlproj-io"); val lake = tmpDir("sqlproj-io-lake")
    writeModel(dir, "daily",
      """-- graft: materialized=insert_overwrite partition_by=day
        |-- test: not_null provider_id
        |select day, provider_id, n from {{ source('batch') }}""".stripMargin)
    def run(df: org.apache.spark.sql.DataFrame) =
      SqlProject.load(spark, dir, lake,
        Map("batch" -> (_ => df))).run(spark, _ => ())
    val b1 = Seq((1, "p1", 10L), (1, "p2", 11L), (2, "p3", 20L))
      .toDF("day", "provider_id", "n")
    assert(run(b1).ok)
    // second batch REVISES day 2 (different rows — replacement, not merge)
    // and adds day 3; day 1 must come back untouched
    val b2 = Seq((2, "p9", 99L), (3, "p4", 30L))
      .toDF("day", "provider_id", "n")
    assert(run(b2).ok)
    val t = new SnapshotTable(spark, s"$lake/daily")
    val got = t.readInPlace().select("day", "provider_id", "n")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "p1", 10L), (1, "p2", 11L),
      (2, "p9", 99L), (3, "p4", 30L)))
    // a failed Error check writes nothing: every partition keeps its rows
    val bad = Seq((1, null.asInstanceOf[String], 1L))
      .toDF("day", "provider_id", "n")
    assert(!run(bad).ok)
    assert(t.readInPlace().count() == 4)
    // config validation: the strategy needs its partition column
    intercept[IllegalArgumentException] {
      SqlProject.parseModel("x",
        "-- graft: materialized=insert_overwrite\nselect 1")
    }
  }

  test("scd2 snapshots: changed check_cols close intervals, unchanged don't") {
    val dir = tmpDir("sqlproj-scd2"); val lake = tmpDir("sqlproj-scd2-lake")
    writeModel(dir, "dim",
      """-- graft: materialized=scd2 unique_key=pid order_by=ts check_cols=status
        |select pid, ts, status from {{ source('ev') }}""".stripMargin)
    def run(df: org.apache.spark.sql.DataFrame) =
      SqlProject.load(spark, dir, lake,
        Map("ev" -> (_ => df))).run(spark, _ => ())
    assert(run(Seq(("p1", 1L, "a"), ("p2", 1L, "x")).toDF("pid", "ts", "status")).ok)
    val t = new SnapshotTable(spark, s"$lake/dim")
    def state() = t.read()
      .select("pid", "valid_from", "valid_to", "is_current", "status")
      .as[(String, Long, Option[Long], Boolean, String)].collect().toSet
    assert(state() == Set(("p1", 1L, None, true, "a"), ("p2", 1L, None, true, "x")))
    // p1's status changes -> its open interval closes at the new event's
    // valid_from; p2 is unchanged -> stays a single open interval
    val b2 = Seq(("p1", 5L, "b"), ("p2", 5L, "x")).toDF("pid", "ts", "status")
    assert(run(b2).ok)
    val expected = Set(
      ("p1", 1L, Some(5L), false, "a"), ("p1", 5L, None, true, "b"),
      ("p2", 1L, None, true, "x"))
    assert(state() == expected)
    // replaying the same batch is a no-op (idempotent snapshots)
    assert(run(b2).ok)
    assert(state() == expected)
  }

  test("excluded refs fall back to the published lake, like dbt slices") {
    val dir = tmpDir("sqlproj-slice"); val lake = tmpDir("sqlproj-slice-lake")
    writeModel(dir, "base",
      """-- graft: materialized=table tags=raw
        |select x from {{ source('xs') }}""".stripMargin)
    writeModel(dir, "downstream",
      """-- graft: materialized=table
        |select x * 2 AS y from {{ ref('base') }}""".stripMargin)
    def proj = SqlProject.load(spark, dir, lake, Map(
      "xs" -> (s => { import s.implicits._; Seq(5, 7).toDF("x") })))
    assert(proj.select("tag:raw").run(spark, _ => ()).ok)
    val sliced = proj.exclude("tag:raw")
    assert(sliced.stages.map(_.name) == Seq("downstream"))
    assert(sliced.run(spark, _ => ()).ok)
    val got = new SnapshotTable(spark, s"$lake/downstream").read()
      .orderBy($"y").as[Long].collect().toSeq
    assert(got == Seq(10L, 14L))
  }

  test("run vars: the insert_overwrite backfill idiom replays one date per run") {
    val dir = tmpDir("sqlproj-vars"); val lake = tmpDir("sqlproj-vars-lake")
    writeModel(dir, "daily",
      """-- graft: materialized=insert_overwrite partition_by=day
        |select day, provider_id, n from {{ source('history') }}
        |where day = {{ var('ds') }} and n >= {{ var('min_n', '0') }}""".stripMargin)
    val history = Seq((1, "p1", 10L), (1, "p2", 11L), (2, "p3", 20L),
      (3, "p4", 30L)).toDF("day", "provider_id", "n")
    def backfill(ds: String, extra: Map[String, String] = Map.empty) =
      SqlProject.load(spark, dir, lake, Map("history" -> (_ => history)),
        vars = Map("ds" -> ds) ++ extra).run(spark, _ => ())
    // backfill days 1 and 3; each run writes only its own partition
    assert(backfill("1").ok)
    assert(backfill("3").ok)
    val t = new SnapshotTable(spark, s"$lake/daily")
    assert(t.readInPlace().select($"day").distinct()
      .as[Int].collect().toSet == Set(1, 3))
    // re-running a date replaces it under the tightened default-var filter
    assert(backfill("1", Map("min_n" -> "11")).ok)
    assert(t.readInPlace().select("day", "provider_id", "n")
      .as[(Int, String, Long)].collect().toSet ==
      Set((1, "p2", 11L), (3, "p4", 30L)))
    // an unset no-default var fails the stage, not silently
    val res = SqlProject.load(spark, dir, lake,
      Map("history" -> (_ => history))).run(spark, _ => ())
    assert(!res.ok)
  }

  test("seeds publish as ref-able snapshot tables ahead of models") {
    val dir = tmpDir("sqlproj-seed"); val lake = tmpDir("sqlproj-seed-lake")
    val seeds = tmpDir("sqlproj-seed-seeds")
    Files.write(Paths.get(seeds, "country_codes.csv"),
      "code,region\nDE,EMEA\nFR,EMEA\nUS,AMER\n".getBytes("UTF-8"))
    writeModel(dir, "tagged",
      """-- graft: materialized=table
        |-- test: not_null region
        |select s.provider_id, s.site_name, c.region
        |from {{ source('sites') }} s
        |join {{ ref('country_codes') }} c on c.code = 'DE'""".stripMargin)
    val p = SqlProject.load(spark, dir, lake,
      Map("sites" -> (_ => sites)), seedsDir = Some(seeds))
    // the seed has no declared dep edge, but stage order must still put
    // it first (dependency-free stages run ahead); ref() then resolves
    assert(p.ordered.map(_.name).indexOf("country_codes") <
      p.ordered.map(_.name).indexOf("tagged"))
    assert(p.run(spark, _ => ()).ok)
    val seedTable = new SnapshotTable(spark, s"$lake/country_codes").read()
    assert(seedTable.count() == 3)
    val got = new SnapshotTable(spark, s"$lake/tagged").read()
      .select($"region").distinct().as[String].collect().toSeq
    assert(got == Seq("EMEA"))
    // seed name colliding with a model is a load-time error
    writeModel(dir, "country_codes", "-- graft: materialized=table\nselect 1 AS x")
    intercept[IllegalArgumentException] {
      SqlProject.load(spark, dir, lake, Map("sites" -> (_ => sites)),
        seedsDir = Some(seeds))
    }
  }
}
