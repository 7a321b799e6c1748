package graft

import org.apache.spark.sql.functions._

import graft.sinks.TableSetRef

/** Cross-table atomic publish: a reader pinning the ref mid-promote must
  * see ALL tables old or ALL tables new — never a mix — and rollback is
  * a plain re-commit of an older mapping.
  */
class TableSetRefSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int, tag: String) =
    (1 to n).map(i => (i.toLong, s"$tag-$i")).toDF("id", "val")

  test("mid-promote reads are all-old or all-new, never mixed") {
    val ref = new TableSetRef(spark, tmpDir("tsr-atomic"))
    // catalog state 1: both tables at generation "a"
    val a1 = ref.stage("customers", mk(100, "a"))
    val b1 = ref.stage("orders", mk(50, "a"))
    ref.commit(Map("customers" -> a1, "orders" -> b1))

    // promotion in progress: generation "b" fully staged, NOT committed
    val a2 = ref.stage("customers", mk(120, "b"))
    val b2 = ref.stage("orders", mk(60, "b"))

    // a reader pinning NOW must see generation "a" for BOTH tables
    val pinnedOld = ref.snapshot()
    assert(pinnedOld.read("customers").count() == 100)
    assert(pinnedOld.read("orders").count() == 50)
    assert(pinnedOld.read("customers").select(max($"val")).head.getString(0)
      .startsWith("a-"))

    ref.commit(Map("customers" -> a2, "orders" -> b2))

    // the pre-commit pin STILL sees all-old (catalog time travel) ...
    assert(pinnedOld.read("customers").count() == 100)
    assert(pinnedOld.read("orders").count() == 50)
    // ... and a fresh pin sees all-new
    val pinnedNew = ref.snapshot()
    assert(pinnedNew.read("customers").count() == 120)
    assert(pinnedNew.read("orders").count() == 60)
    assert(pinnedNew.read("orders").select(max($"val")).head.getString(0)
      .startsWith("b-"))
  }

  test("partial commit merges over the current ref") {
    val ref = new TableSetRef(spark, tmpDir("tsr-partial"))
    val a1 = ref.stage("t1", mk(10, "x"))
    val b1 = ref.stage("t2", mk(20, "x"))
    ref.commit(Map("t1" -> a1, "t2" -> b1))
    val b2 = ref.stage("t2", mk(25, "y"))
    val merged = ref.commit(Map("t2" -> b2))
    assert(merged == Map("t1" -> a1, "t2" -> b2))
    val snap = ref.snapshot()
    assert(snap.read("t1").count() == 10 && snap.read("t2").count() == 25)
  }

  test("uncommitted staging is invisible; commit of unstaged version fails") {
    val ref = new TableSetRef(spark, tmpDir("tsr-invisible"))
    val v = ref.stage("t", mk(5, "x"))
    assert(ref.currentRef().isEmpty, "stage must not publish")
    intercept[IllegalArgumentException] {
      ref.commit(Map("t" -> (v + 7)))
    }
    ref.commit(Map("t" -> v))
    assert(ref.snapshot().read("t").count() == 5)
  }

  test("rollback re-commits an older mapping") {
    val ref = new TableSetRef(spark, tmpDir("tsr-rollback"))
    val v1 = ref.stage("t", mk(10, "v1"))
    ref.commit(Map("t" -> v1))
    val gen1 = ref.currentRef()
    val v2 = ref.stage("t", mk(99, "v2"))
    ref.commit(Map("t" -> v2))
    assert(ref.snapshot().read("t").count() == 99)
    ref.rollbackTo(gen1)
    assert(ref.snapshot().read("t").count() == 10)
    assert(ref.snapshot().read("t").select(max($"val")).head.getString(0)
      .startsWith("v1-"))
  }

  test("ref survives many commits with GC keeping recent history") {
    val ref = new TableSetRef(spark, tmpDir("tsr-gc"))
    val versions = (1 to 8).map { i =>
      val v = ref.stage("t", mk(i, s"g$i"))
      ref.commit(Map("t" -> v))
      v
    }
    assert(ref.snapshot().read("t").count() == 8)
    // rollback to the most recent still-listed older generation works
    ref.rollbackTo(Map("t" -> versions(6)))
    assert(ref.snapshot().read("t").count() == 7)
  }
}
