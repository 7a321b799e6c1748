package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over event streams: watermarked windowed
  * aggregation and custom session state — the streaming operators a
  * training-data/telemetry pipeline needs beyond CDC ingestion.
  *
  * Scale posture: state is the whole game in streaming. The windowed agg
  * keeps one row of state per (window, event_type) and the watermark lets
  * Spark DROP window state once event time passes window_end + watermark —
  * bounded state at any throughput. The sessionizer keys state by user and
  * expires it by event-time timeout, so state is O(active users), not
  * O(events seen).
  */
object EventStream {

  /** Tumbling-window counts/sums per event_type with a watermark for late
    * data. Append mode: a window emits once, when the watermark passes it. */
  def windowedAgg(events: DataFrame, windowLen: String = "5 minutes",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Tumbling-window totals with engine-portable money quantization — the
    * oracle-gated twin of [[windowedAgg]]: cents are quantized PER ROW
    * before the sum (floating sums differ across engines), window starts
    * are epoch seconds, and there is no watermark because the gate runs
    * Complete mode — append mode would hold back every window the
    * watermark has not closed, so an end-of-stream oracle comparison
    * would miss the trailing windows. */
  def windowedTotals(events: DataFrame, windowLen: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100.0 + 0.5)).cast("long").as("value_cents"))
      .select(col("window.start").cast("long").as("window_start_s"),
        col("event_type"), col("n"), col("value_cents"))

  /** File-sourced Complete-mode run of [[windowedTotals]] into a memory
    * sink; returns the full end-of-stream aggregate. Complete mode keeps
    * all window state — correct for a bounded replay gate; a continuous
    * deployment uses [[windowedAgg]]'s watermarked append mode instead. */
  def runWindowedTotalsOnce(spark: SparkSession, parquetDir: String,
                            schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val raw = spark.readStream.schema(schema).parquet(parquetDir)
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val name = s"windowed_totals_${java.lang.System.nanoTime}"
    val q = windowedTotals(stream).writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)
  final case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
                           n_events: Long, total_value: Double)

  /** Stateful gap sessionization via flatMapGroupsWithState: a session
    * closes after `gapMs` of user inactivity (event-time timeout), emitting
    * one Session row. The streaming twin of the batch q32_sessionize. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.lastSeen, s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val tUs = e.ts.getTime * 1000L
              cur match {
                case Some(s) if tUs - s.lastSeen <= gapMs * 1000L =>
                  cur = Some(s.copy(lastSeen = tUs, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.lastSeen, s.nEvents, s.totalValue)
                  cur = Some(SessionState(tUs, tUs, 1, e.value))
                case None =>
                  cur = Some(SessionState(tUs, tUs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen / 1000L + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** [[sessionize]]'s logic on Spark 4's `transformWithState` API — the
    * successor to flatMapGroupsWithState: explicit named state variables
    * (schema'd, evolvable, RocksDB-backed — set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider) and explicit event-time timers instead of the single
    * implicit timeout. Same contract as [[sessionize]]: sessions closed
    * by a newer event emit immediately; open sessions emit when their
    * gap timer fires past the watermark. */
  class GapSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = if (state.exists()) Some(state.get()) else None
      cur.foreach(s => getHandle.deleteTimer(s.lastSeen / 1000L + gapMs))
      sorted.foreach { e =>
        val tUs = e.ts.getTime * 1000L
        cur match {
          case Some(s) if tUs - s.lastSeen <= gapMs * 1000L =>
            cur = Some(s.copy(lastSeen = tUs, nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value))
          case Some(s) =>
            closed ::= Session(userId, s.start, s.lastSeen, s.nEvents, s.totalValue)
            cur = Some(SessionState(tUs, tUs, 1, e.value))
          case None =>
            cur = Some(SessionState(tUs, tUs, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s.lastSeen / 1000L + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(Session(userId, s.start, s.lastSeen, s.nEvents, s.totalValue))
      } else Iterator.empty
  }

  /** Gap sessionization via [[GapSessionProcessor]] / transformWithState. */
  def sessionizeTws(events: Dataset[Event],
                    gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapMs),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** Stream-stream INTERVAL JOIN: each left event pairs with right events
    * for the same user whose event time falls in [left.ts, left.ts +
    * horizon] — the attribution primitive (click → purchase within N
    * minutes). Both sides carry watermarks and the join condition bounds
    * event time BOTH ways, which is what lets Spark expire buffered state:
    * a row older than watermark + horizon can never join again and is
    * dropped, so state is O(events inside the horizon), not O(stream).
    * Append-only output; equi-key (user_id) keeps the join
    * hash-partitioned — never a broadcast-nested-loop. */
  def intervalJoin(left: DataFrame, right: DataFrame, horizon: String = "15 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** Stream-stream interval join, LEFT OUTER: like [[intervalJoin]] but
    * left events with no right match inside the horizon still emit (with
    * null right columns) — the "clicks that never converted" shape, which
    * an inner interval join silently drops. The null row for a left event
    * can only be emitted once the watermark passes `l_ts + horizon`
    * (before that a match could still arrive), so unmatched results trail
    * the stream by exactly the horizon + watermark delay — the price of
    * correctness, not a config knob. State stays bounded exactly as in
    * the inner variant. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            horizon: String = "15 minutes",
                            watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
      "leftOuter")
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** Native session-window aggregation (`session_window`): per-user
    * sessions that extend while events arrive within `gap` of the last
    * one — the built-in operator for the plain "gap sessions + additive
    * aggregates" case, with [[sessionize]] (flatMapGroupsWithState)
    * reserved for session logic the built-in can't express (custom
    * emission, non-additive state). Append mode: a session emits once the
    * watermark passes its end. Money is quantized per row before the sum
    * so the streamed figure is bit-identical to the batch twin — the same
    * `session_window` call works in a plain batch groupBy, which is what
    * the spec gates against. State per in-flight session row, dropped at
    * emission — bounded by active sessions. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100.0 + 0.5)).cast("long").as("value_cents"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_cents"))

  /** Run a file-sourced event stream through `windowedAgg` into an
    * in-memory table (local smoke path; swap source/sink for Kafka/parquet
    * in production — the transform is identical). Returns the result. */
  def runWindowedOnce(spark: SparkSession, parquetDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      queryName: String): DataFrame = {
    val raw = spark.readStream.schema(schema).parquet(parquetDir)
    // nanosAsLong surfaces TIMESTAMP(NANOS) as epoch-nanos longs
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val q = windowedAgg(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Stream-static enrichment: join a stream against a (small) dimension
    * snapshot. The static side is broadcast — each micro-batch is a
    * stateless map-side hash join, no streaming state at all, which is
    * why this is THE first-choice enrichment shape before stream-stream
    * joins ([[intervalJoin]]) with their watermarked state stores. The
    * dimension is re-read per batch by Spark's scan semantics only if the
    * source re-plans; for a pinned snapshot read it is stable for the
    * stream's lifetime — restart the stream to pick up a new dimension
    * version (the WAP-published `SnapshotTable.read()` fits directly). */
  def enrich(stream: DataFrame, dim: DataFrame,
             joinKeys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinKeys, "left")

  /** Streaming incremental-aggregate maintenance: fold each micro-batch
    * into an [[graft.ops.IncrementalAgg]] store (AvailableNow + checkpoint
    * = each file batch processed once; the foreachBatch id makes a
    * crash-replayed batch dedupe away inside the store — see
    * `IncrementalAgg.appendBatch`). The stream-side work per batch is one
    * batch-sized partial aggregation and an append; the accumulated
    * aggregate is never read, let alone rewritten, on the hot path. */
  def maintainAggAvailableNow(spark: SparkSession, parquetDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              store: graft.sinks.AppendOnlyStore,
                              spec: graft.ops.IncrementalAgg.Spec,
                              checkpointDir: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.IncrementalAgg.appendBatch(store, batch, spec, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming distinct-count maintenance — the [[maintainAggAvailableNow]]
    * twin for [[graft.ops.SketchAgg]]: each micro-batch folds to one HLL
    * sketch per key and appends; replay dedupes on the foreachBatch id.
    * Per-batch work is batch-sized; the union-on-read estimate never
    * touches this hot path. */
  def maintainDistinctAvailableNow(spark: SparkSession, parquetDir: String,
                                   schema: org.apache.spark.sql.types.StructType,
                                   store: graft.sinks.AppendOnlyStore,
                                   spec: graft.ops.SketchAgg.Spec,
                                   checkpointDir: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.SketchAgg.appendBatch(store, batch, spec, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming quantile maintenance — the third twin, for
    * [[graft.ops.QuantileSketchAgg]]: each micro-batch folds to one
    * mergeable KLL sketch per key and appends; replay dedupes on the
    * foreachBatch id, so "p99 per key, maintained by the stream" costs
    * one batch-sized fold per trigger and the raw stream is never
    * re-read. */
  /** Streaming heavy-hitter maintenance — the fourth twin, for
    * [[graft.ops.HeavyHitterAgg]]: each micro-batch folds to one
    * SpaceSaving summary per key and appends; replay dedupes on the
    * foreachBatch id, so "top items per key, maintained by the stream"
    * costs one batch-sized fold per trigger and the raw stream is never
    * re-read. */
  def maintainHeavyHittersAvailableNow(spark: SparkSession, parquetDir: String,
                                       schema: org.apache.spark.sql.types.StructType,
                                       store: graft.sinks.AppendOnlyStore,
                                       spec: graft.ops.HeavyHitterAgg.Spec,
                                       checkpointDir: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.HeavyHitterAgg.appendBatch(store, batch, spec, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  def maintainQuantilesAvailableNow(spark: SparkSession, parquetDir: String,
                                    schema: org.apache.spark.sql.types.StructType,
                                    store: graft.sinks.AppendOnlyStore,
                                    spec: graft.ops.QuantileSketchAgg.Spec,
                                    checkpointDir: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.QuantileSketchAgg.appendBatch(store, batch, spec, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming retractable-extrema maintenance — the twin for
    * [[graft.ops.MinMaxAgg]]'s value-multiset store. The stream may
    * carry a signed multiplicity column (CDC deletes/updates as
    * negative `__delta`); without one every row counts +1. Per-batch
    * work is one batch-sized fold to (key, value, Σδ) net rows;
    * replays dedup on the foreachBatch id, and the current min/max/
    * top-k/quantiles re-fold stored groups off the hot path. */
  def maintainMinMaxAvailableNow(spark: SparkSession, parquetDir: String,
                                 schema: org.apache.spark.sql.types.StructType,
                                 store: graft.sinks.AppendOnlyStore,
                                 spec: graft.ops.MinMaxAgg.Spec,
                                 checkpointDir: String,
                                 deltaCol: Option[String] = None): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deltaCol match {
          case Some(c) =>
            graft.ops.MinMaxAgg.appendDelta(store, batch, spec, batchId, c)
          case None =>
            graft.ops.MinMaxAgg.appendBatch(store, batch, spec, batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming set-overlap maintenance — the fifth twin, for
    * [[graft.ops.OverlapAgg]]: each micro-batch folds to one KMV sketch
    * per key and appends; replay dedupes on the foreachBatch id, so
    * "audience overlap across sources, maintained by the stream" costs
    * one batch-sized fold per trigger and the raw stream is never
    * re-read. */
  def maintainOverlapAvailableNow(spark: SparkSession, parquetDir: String,
                                  schema: org.apache.spark.sql.types.StructType,
                                  store: graft.sinks.AppendOnlyStore,
                                  spec: graft.ops.OverlapAgg.Spec,
                                  checkpointDir: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.OverlapAgg.appendBatch(store, batch, spec, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
