package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked windowed agg over a file stream matches batch totals") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.sources.Tables.load(spark, dir, "events")
    // streaming file source wants a directory; stage the single file
    val streamDir = tmpDir("winstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val got = EventStream.runWindowedOnce(spark, streamDir,
      schema, "win_smoke")
    // batch equivalent over the same 5-minute tumbling windows. Append
    // mode only emits windows the final watermark (max ts - 10 min)
    // passed — the last open window(s) correctly stay unemitted.
    val maxTs = batch.agg(max($"ts")).head().getTimestamp(0)
    val closed = batch
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .filter($"window.end" <= lit(new Timestamp(maxTs.getTime - 10 * 60000)))
    assert(got.count() == closed.count())
    assert(got.agg(sum($"n")).head().getLong(0) ==
      closed.agg(sum($"n")).head().getLong(0))
  }

  test("stream-static enrichment broadcast-joins a dimension per batch") {
    import org.apache.spark.sql.types._
    val streamDir = tmpDir("enrich") + "/in"
    Seq((1L, "click"), (2L, "view"), (3L, "click"))
      .toDF("user_id", "event_type")
      .coalesce(1).write.parquet(streamDir)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStream.enrich(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, "click", Some("gold")),
      (2L, "view", Some("basic")),
      (3L, "click", None))) // unmatched keys survive (left join)
  }

  test("stream-stream interval join pairs events inside the horizon only") {
    def ev(u: Long, minute: Long, t: String, v: Double) =
      Event(u, new Timestamp(1700000000000L + minute * 60000L), t, v)
    // u1: click→purchase@+5min joins; purchase@+20min is past the horizon
    // u2: click with no purchase; u3: purchase with no click
    val events = Seq(
      ev(1, 0, "click", 1.0), ev(1, 5, "purchase", 10.0),
      ev(1, 20, "purchase", 99.0),
      ev(2, 0, "click", 2.0), ev(3, 1, "purchase", 30.0))
    val dir = tmpDir("ssjoin")
    events.toDF().repartition(1).write.parquet(s"$dir/in")
    val schema = events.toDF().schema
    def stream(tpe: String) = spark.readStream.schema(schema)
      .parquet(s"$dir/in").filter($"event_type" === tpe)
    val q = EventStream.intervalJoin(stream("click"), stream("purchase"),
        horizon = "15 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssjoin").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin")
      .select($"user_id", $"l_value", $"r_value")
      .as[(Long, Double, Double)].collect().toSet
    assert(got == Set((1L, 1.0, 10.0)))
  }

  test("stateful sessionizer closes sessions on gap and aggregates values") {
    def ev(u: Long, minute: Long, v: Double) =
      Event(u, new Timestamp(1700000000000L + minute * 60000L), "click", v)
    // user 1: two sessions (gap 40min > 30min); user 2: one session
    val events = Seq(
      ev(1, 0, 1.0), ev(1, 10, 2.0), // session A
      ev(1, 50, 4.0),                // session B (gap 40)
      ev(2, 5, 8.0), ev(2, 20, 16.0))
    val dir = tmpDir("sess")
    events.toDF().repartition(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(events.toDF().schema).parquet(s"$dir/in").as[Event]
    val q = EventStream.sessionize(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[Session].collect()
    // with a single micro-batch, only sessions CLOSED by a newer event are
    // emitted (open sessions await timeout): user 1's first session
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 1 && s.n_events == 2 && s.total_value == 3.0)
    assert((s.session_end_us - s.session_start_us) == 10L * 60 * 1000000)
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState twin") {
    def ev(u: Long, minute: Long, v: Double) =
      Event(u, new Timestamp(1700000000000L + minute * 60000L), "click", v)
    val events = Seq(
      ev(1, 0, 1.0), ev(1, 10, 2.0), // session A (closed by the gap below)
      ev(1, 50, 4.0),                // session B
      ev(2, 5, 8.0), ev(2, 20, 16.0))
    val dir = tmpDir("sesstws")
    events.toDF().repartition(1).write.parquet(s"$dir/in")
    // two watermark pushers: timers fire once the watermark passes
    // lastSeen + gap, and emission trails the advance by a micro-batch
    Seq(ev(9, 300, 0.0)).toDF().repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    Seq(ev(9, 301, 0.0)).toDF().repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(events.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in").as[Event]
      val q = EventStream.sessionizeTws(stream)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sesstws").start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sesstws").as[Session].collect()
        .filter(_.user_id != 9)
        .map(s => (s.user_id, s.n_events, s.total_value,
          (s.session_end_us - s.session_start_us) / 60000000L)).toSet
      // all three sessions close (two by newer events / timers past the
      // pushed watermark): same result the fMGWS sessionizer produces
      assert(got == Set((1L, 2L, 3.0, 10L), (1L, 1L, 4.0, 0L),
        (2L, 2L, 24.0, 15L)))
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("left-outer interval join emits unmatched clicks after the horizon closes") {
    def ev(u: Long, minute: Long, t: String, v: Double) =
      Event(u, new Timestamp(1700000000000L + minute * 60000L), t, v)
    val dir = tmpDir("ssoj")
    // batch 1: u1 converts inside the horizon, u2 never converts
    Seq(ev(1, 0, "click", 1.0), ev(1, 5, "purchase", 10.0),
        ev(2, 0, "click", 2.0))
      .toDF().repartition(1).write.parquet(s"$dir/in")
    // batch 2: pushers on BOTH sides (the global watermark is the MIN of
    // the two sides' watermarks → 60-10 = 50 > 0+15 once batch 2 ends);
    // batch 3: one more batch so the null-side emission — which trails
    // the watermark update by a batch — actually runs
    val schema = Seq(ev(1, 0, "click", 1.0)).toDF().schema
    Seq(ev(9, 60, "click", 0.0), ev(8, 60, "purchase", 0.0))
      .toDF().repartition(1).write.mode("append").parquet(s"$dir/in")
    Seq(ev(9, 62, "click", 0.0), ev(8, 62, "purchase", 0.0))
      .toDF().repartition(1).write.mode("append").parquet(s"$dir/in")
    def stream(tpe: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in").filter($"event_type" === tpe)
    val q = EventStream.intervalJoinLeftOuter(
        stream("click"), stream("purchase"), horizon = "15 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssoj").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssoj")
      .select($"user_id", $"l_value", $"r_value")
      .as[(Long, Double, Option[Double])].collect().toSet
    // u1 pairs; u2 emits with a NULL right side; the u9 pusher click's
    // own horizon has not closed, so it stays buffered — not emitted
    assert(got == Set((1L, 1.0, Some(10.0)), (2L, 2.0, None)))
  }

  test("native session_window agg matches the batch twin bit-for-bit") {
    def ev(u: Long, minute: Long, v: Double) =
      Event(u, new Timestamp(1700000000000L + minute * 60000L), "click", v)
    val events = Seq(
      ev(1, 0, 1.25), ev(1, 10, 2.50),  // session A: 2 events, 375 cents
      ev(1, 50, 4.75),                  // session B (gap 40 > 30)
      ev(2, 5, 8.00), ev(2, 20, 16.0))  // one session, 2400 cents
    val dir = tmpDir("sesswin")
    events.toDF().repartition(1).write.parquet(s"$dir/in")
    // watermark pushers far enough out (minute 300 → watermark 240) to
    // close every session; two batches because emission trails the
    // watermark update by one micro-batch
    Seq(ev(9, 300, 0.0)).toDF().repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    Seq(ev(9, 301, 0.0)).toDF().repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val schema = events.toDF().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStream.sessionWindowAgg(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sesswin").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sesswin")
      .filter($"user_id" =!= 9)
      .select($"user_id", $"session_start", $"session_end",
        $"n_events", $"value_cents")
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    // the SAME session_window call in a plain batch groupBy — the
    // stream/batch equivalence contract
    val batch = EventStream.sessionWindowAgg(
        events.toDF().where($"user_id" =!= 9))
      .as[(Long, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.size == 3)
    assert(streamed.map(s => (s._1, s._4, s._5)) ==
      Set((1L, 2L, 375L), (1L, 1L, 475L), (2L, 2L, 2400L)))
  }
}
