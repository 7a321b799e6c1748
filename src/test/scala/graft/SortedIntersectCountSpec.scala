package graft

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.functions._

/** Native sorted-merge intersection count vs the builtin
  * `size(array_intersect)` oracle, across random sorted arrays, empties,
  * nulls, and both eval paths (codegen on via the DataFrame pipeline,
  * interpreted via nullSafeEval). */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted distinct arrays") {
    SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("got", SortedIntersectCount($"a", $"b"))
      .withColumn("want", size(array_intersect($"a", $"b")).cast("long"))
    assert(df.where($"got" =!= $"want").count() == 0)
    // and the result is not degenerate
    assert(df.where($"got" > 0).count() > 0)
  }

  test("empty arrays, disjoint arrays, identical arrays, nulls") {
    SortedIntersectCount.register(spark)
    val df = Seq(
      (1L, Seq.empty[Long], Seq(1L, 2L)),
      (2L, Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (3L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (4L, Seq(1L, 5L, 9L), Seq(5L, 9L, 11L))
    ).toDF("id", "a", "b")
      .withColumn("c", SortedIntersectCount($"a", $"b"))
    val got = df.select($"id", $"c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 2L))
    val withNull = Seq((1L, Option(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("id", "a", "b")
      .withColumn("c", SortedIntersectCount($"a", $"b"))
    assert(withNull.select($"c").collect()(0).isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = SortedIntersectCount(
      Literal.create(Array(1L, 3L, 7L)), Literal.create(Array(3L, 7L, 9L)))
    assert(e.eval(null) == 2L)
  }
}
