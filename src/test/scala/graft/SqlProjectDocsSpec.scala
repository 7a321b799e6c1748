package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.SqlProject

/** `writeDocs` — the dbt `docs generate` analog: manifest.json must carry
  * every node, edge, materialization, and test of the parsed project, and
  * lineage.html must be a self-contained DAG page. Pure parsing — these
  * tests never start a Spark job. */
class SqlProjectDocsSpec extends SparkSpec {

  private def writeModel(dir: String, name: String, text: String): Unit =
    Files.write(Paths.get(dir, s"$name.sql"), text.getBytes("UTF-8"))

  private def fixtureProject(): (String, String) = {
    val dir = tmpDir("docs-models")
    val seeds = tmpDir("docs-seeds")
    writeModel(dir, "raw_events",
      """-- graft: materialized=merge unique_key=event_id order_by=event_ts tags=raw
        |-- test: unique event_id
        |select * from {{ source('events') }}""".stripMargin)
    writeModel(dir, "enriched",
      """-- graft: materialized=ephemeral tags=staging
        |select e.*, c.iso from {{ ref('raw_events') }} e
        |  join {{ ref('country_codes') }} c on e.cc = c.cc""".stripMargin)
    writeModel(dir, "curated",
      """-- graft: materialized=table tags=curated
        |-- test: not_null event_id severity=warn
        |-- test: relationships cc country_codes cc
        |select * from {{ ref('enriched') }}""".stripMargin)
    Files.write(Paths.get(seeds, "country_codes.csv"),
      "cc,iso\nus,USA\n".getBytes("UTF-8"))
    (dir, seeds)
  }

  test("manifest.json lists nodes, edges, materializations, and tests") {
    val (dir, seeds) = fixtureProject()
    val out = tmpDir("docs-out")
    SqlProject.writeDocs(dir, out, Some(seeds))
    val manifest = Files.readString(Paths.get(out, "manifest.json"))
    // every node with its type and materialization
    assert(manifest.contains(""""name":"raw_events","type":"model","materialized":"merge""""))
    assert(manifest.contains(""""name":"enriched","type":"model","materialized":"ephemeral""""))
    assert(manifest.contains(""""name":"curated","type":"model","materialized":"table""""))
    assert(manifest.contains(""""name":"country_codes","type":"seed""""))
    // ref and source edges discovered from the SQL
    assert(manifest.contains(
      """{"from":"raw_events","to":"enriched","kind":"ref"}"""))
    assert(manifest.contains(
      """{"from":"country_codes","to":"enriched","kind":"ref"}"""))
    assert(manifest.contains(
      """{"from":"enriched","to":"curated","kind":"ref"}"""))
    assert(manifest.contains(
      """{"from":"events","to":"raw_events","kind":"source"}"""))
    // tests with severity
    assert(manifest.contains(
      """{"kind":"unique","args":["event_id"],"severity":"error"}"""))
    assert(manifest.contains(
      """{"kind":"not_null","args":["event_id"],"severity":"warn"}"""))
    assert(manifest.contains(""""kind":"relationships""""))
    // config the impact-analysis consumer needs
    assert(manifest.contains(""""unique_key":["event_id"]"""))
    // parses as balanced JSON (no library in the test classpath — check
    // structural invariants the writer must uphold)
    assert(manifest.count(_ == '{') == manifest.count(_ == '}'))
    assert(manifest.count(_ == '[') == manifest.count(_ == ']'))
  }

  test("lineage.html is a self-contained DAG with every node and edge drawn") {
    val (dir, seeds) = fixtureProject()
    val out = tmpDir("docs-out2")
    SqlProject.writeDocs(dir, out, Some(seeds))
    val html = Files.readString(Paths.get(out, "lineage.html"))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(!html.contains("src=") && !html.contains("href="),
      "must be self-contained: no external scripts/styles")
    Seq("raw_events", "enriched", "curated", "country_codes", "events")
      .foreach(n => assert(html.contains(s">$n</text>"), s"node $n missing"))
    // 4 ref/source edges => 4 svg paths
    assert("<path ".r.findAllIn(html).size == 4)
    // the model table carries materializations and tests
    assert(html.contains("<td>merge</td>"))
    assert(html.contains("unique event_id"))
    assert(html.contains("<em>(warn)</em>"))
  }

  test("docs depth layout: a node's column is downstream of all its parents") {
    val (dir, seeds) = fixtureProject()
    val out = tmpDir("docs-out3")
    SqlProject.writeDocs(dir, out, Some(seeds))
    val html = Files.readString(Paths.get(out, "lineage.html"))
    def xOf(n: String): Int = {
      val r = s"""<rect x="(\\d+)"[^/]*/><text[^>]*>$n</text>""".r
      r.findFirstMatchIn(html).map(_.group(1).toInt)
        .getOrElse(fail(s"node $n not found in svg"))
    }
    assert(xOf("raw_events") > xOf("events"))
    assert(xOf("enriched") > xOf("raw_events"))
    assert(xOf("enriched") > xOf("country_codes"))
    assert(xOf("curated") > xOf("enriched"))
  }
}
