package graft

import org.apache.spark.sql.functions.concat_ws

import graft.checks.Checks
import graft.checks.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1, Some("a"), "x"), (2, Some("b"), "y"), (2, None, "z"))
    .toDF("id", "name", "cat")

  test("unique flags duplicate keys") {
    val rs = Checks.runAll(df, Seq(Unique(Seq("id"))))
    assert(!rs.head.passed && rs.head.violations == 1)
    assert(Checks.runAll(df, Seq(Unique(Seq("id", "cat")))).head.passed)
  }

  test("not_null counts nulls") {
    val rs = Checks.runAll(df, Seq(NotNull("name"), NotNull("id")))
    assert(!rs(0).passed && rs(0).violations == 1)
    assert(rs(1).passed)
  }

  test("accepted_values ignores NULLs, flags strays") {
    val rs = Checks.runAll(df, Seq(AcceptedValues("cat", Seq("x", "y"))))
    assert(!rs.head.passed && rs.head.violations == 1)
    val rs2 = Checks.runAll(df, Seq(AcceptedValues("name", Seq("a", "b"))))
    assert(rs2.head.passed) // the NULL name passes
  }

  test("relationships: NULL FKs pass, orphans flagged (dbt semantics)") {
    val parent = Seq(1, 2).toDF("pid")
    val child = Seq(Some(1), Some(99), None).toDF("fk")
    val rs = Checks.runAll(child, Seq(Relationships("fk", parent, "pid")))
    assert(!rs.head.passed && rs.head.violations == 1) // only 99
  }

  test("expression checks count predicate failures, NULLs violate") {
    val df2 = Seq((1, Some(5)), (2, Some(-1)), (3, None)).toDF("id", "v")
    val rs = Checks.runAll(df2, Seq(
      Expression("v_nonneg", $"v" >= 0),
      Expression("id_positive", $"id" > 0)))
    assert(!rs(0).passed && rs(0).violations == 2) // -1 and the NULL
    assert(rs(1).passed)
  }

  test("custom checks run arbitrary logic as singular tests") {
    val parent = Seq(1, 2).toDF("pid")
    val rs = Checks.runAll(df, Seq(
      CustomCheck("ids_in_parent",
        d => d.join(parent, d("id") === parent("pid"), "left_anti").count())))
    assert(rs.head.check == "custom" && rs.head.passed) // ids 1,2 both present
    val rs2 = Checks.runAll(df, Seq(
      CustomCheck("always_fails", _ => 7L, Checks.Warn)))
    assert(!rs2.head.passed && rs2.head.violations == 7
      && rs2.head.severity == Checks.Warn)
  }

  test("row_count and freshness monitors") {
    val rs = Checks.runAll(df, Seq(RowCountBetween(1, 10)))
    assert(rs.head.passed)
    assert(!Checks.runAll(df, Seq(RowCountBetween(5))).head.passed)
  }

  test("metrics emits one row of volume/null-rate numbers") {
    val m = Checks.metrics(df, Seq("name"), None).collect()(0)
    assert(m.getAs[Long]("row_count") == 3 && m.getAs[Long]("nulls_name") == 1)
  }

  test("split quarantines violating rows with attributed reasons") {
    val rows = Seq(
      (1L, "a", 10L, 1L),   // clean
      (2L, null, 10L, 1L),  // not_null:name
      (3L, "zz", 10L, 1L),  // accepted_values:name
      (4L, "a", -5L, 1L),   // expression:v_nonneg
      (5L, "a", 10L, 9L),   // relationships:fk
      (6L, null, -1L, 9L),  // three violations at once
      (7L, "a", 10L, 1L), (7L, "b", 10L, 1L)) // unique:id ×2
      .toDF("id", "name", "v", "fk")
    val parent = Seq(1L, 2L).toDF("pid")
    val (clean, bad) = Checks.split(rows, Seq(
      NotNull("name"),
      AcceptedValues("name", Seq("a", "b")),
      Expression("v_nonneg", $"v" >= 0),
      Unique(Seq("id")),
      Relationships("fk", parent, "pid"),
      RowCountBetween(1, 2))) // table-level: must be ignored
    assert(clean.count() + bad.count() == rows.count())
    assert(clean.select($"id").as[Long].collect().sorted.toSeq == Seq(1L))
    assert(clean.columns.toSeq == rows.columns.toSeq,
      "clean side must come back helper-free")
    val reasons = bad.select($"id", concat_ws(";", $"__violations"))
      .as[(Long, String)].collect().toMap
    assert(reasons(2L) == "not_null:name")
    assert(reasons(3L) == "accepted_values:name")
    assert(reasons(4L) == "expression:v_nonneg")
    assert(reasons(5L) == "relationships:fk")
    assert(reasons(6L) == "not_null:name;expression:v_nonneg;relationships:fk")
    assert(reasons(7L) == "unique:id" && bad.filter($"id" === 7L).count() == 2)
  }
}
