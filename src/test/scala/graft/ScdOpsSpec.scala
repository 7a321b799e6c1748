package graft

import org.apache.spark.sql.functions._

import graft.ops.ScdOps

class ScdOpsSpec extends SparkSpec {
  import spark.implicits._

  private def build(rows: Seq[(Long, Long, String)]) =
    ScdOps.scd2(
      rows.toDF("key", "seq", "attr"),
      keyCols = Seq("key"),
      orderCols = Seq($"seq"),
      attrCols = Seq("attr"),
      validFrom = $"seq")

  test("consecutive identical attribute values collapse into one interval") {
    val out = build(Seq(
        (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
        (2L, 5L, "x")))
      .select($"key", $"attr", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"key", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out === Seq(
      (1L, "a", 10L, 30L, false),  // 20L "a" collapsed in
      (1L, "b", 30L, 40L, false),
      (1L, "a", 40L, -1L, true),   // re-opened: a→b→a is three intervals
      (2L, "x", 5L, -1L, true)))
  }

  test("intervals tile the key's timeline: each valid_to equals the next valid_from") {
    val rows = (1 to 200).map { i =>
      (i.toLong % 7, i.toLong, s"v${i % 3}")
    }
    val out = build(rows)
    val byKey = out.select($"key", $"valid_from", $"valid_to").collect()
      .groupBy(_.getLong(0))
    byKey.values.foreach { iv =>
      val sorted = iv.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) == b.getLong(1))
        case _           => ()
      }
      assert(sorted.last.isNullAt(2), "last interval must be open")
    }
  }

  test("null attribute values open and close intervals null-safely") {
    val out = ScdOps.scd2(
        Seq((1L, 1L, Some("a")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some("a")))
          .toDF("key", "seq", "attr"),
        keyCols = Seq("key"),
        orderCols = Seq($"seq"),
        attrCols = Seq("attr"),
        validFrom = $"seq")
      .orderBy($"valid_from")
      .select($"attr", $"valid_from")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    // a@1, null@2 (opens), null@3 collapses, a@4 re-opens
    assert(out === Seq((Some("a"), 1L), (None, 2L), (Some("a"), 4L)))
  }

  test("snapshotDiff classifies insert/update/delete and drops unchanged keys") {
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "status", "cents")
    val v2 = Seq((2L, "b", 20L), (3L, "c", 99L), (4L, "D", 40L), (5L, "e", 50L))
      .toDF("k", "status", "cents")
    val out = ScdOps.snapshotDiff(v1, v2, Seq("k"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out === Seq(
      (1L, "delete", "a", 10L),   // old image carried for deletes
      (3L, "update", "c", 99L),   // new image for updates
      (4L, "update", "D", 40L),
      (5L, "insert", "e", 50L)))  // k=2 unchanged → dropped
  }

  test("snapshotDiff compares attribute nulls null-safely") {
    val v1 = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("k", "v")
    val v2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("k", "v")
    val out = ScdOps.snapshotDiff(v1, v2, Seq("k")).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "update"))) // null==null unchanged; "a"→null is an update
  }

  test("diffVersions reads two published snapshots and feeds the same diff") {
    val root = tmpDir("scd-diff")
    val tbl = new graft.sinks.SnapshotTable(spark, s"$root/t")
    tbl.publish(tbl.stage(Seq((1L, "x"), (2L, "y")).toDF("k", "v")))
    tbl.publish(tbl.stage(Seq((1L, "x"), (2L, "z"), (3L, "w")).toDF("k", "v")))
    val out = tbl.diffVersions(1L, 2L, Seq("k"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out === Seq((2L, "update", "z"), (3L, "insert", "w")))
  }

  test("plan: one exchange, one sort for the whole lag+filter+lead chain") {
    val plan = build(Seq((1L, 1L, "a"), (1L, 2L, "b")))
      .queryExecution.executedPlan.toString
    assert("(?i)exchange".r.findAllIn(plan).size == 1, plan)
    assert("(?i)\\bsort\\b".r.findAllIn(plan).size <= 1, plan)
  }
}
