package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** CLI entry: drive the streaming operators end-to-end on the driver's
  * events table — windowed aggregation with watermark, then stateful gap
  * sessionization — and print summary counts.
  *
  * Usage: `runMain graft.RunStreaming [sfDir]`
  */
object RunStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-streaming")
    import spark.implicits._

    // stage the single-file table into a stream-source directory
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    val windows = EventStream.runWindowedOnce(spark, streamDir, schema, "win_cli")
    println(s"[streaming] windowed agg: ${windows.count()} closed (window,event_type) rows, " +
      s"${windows.agg(sum($"n")).head().getLong(0)} events in closed windows")

    val q = EventStream.sessionize(spark.readStream
        .schema(schema).parquet(streamDir) // ts arrives as epoch-nanos long
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select($"user_id", $"ts", $"event_type", $"value").as[EventStream.Event])
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_cli").start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions_cli")
    println(s"[streaming] sessionizer: ${sessions.count()} closed sessions, " +
      s"max events/session=${sessions.agg(max($"n_events")).head().getLong(0)}")

    // stream-stream interval join: purchases attributed to a click within
    // 15 minutes, per user
    def typedStream = spark.readStream
      .schema(schema).parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val j = EventStream.intervalJoin(
        typedStream.filter($"event_type" === "click"),
        typedStream.filter($"event_type" === "purchase"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attrib_cli").start()
    j.processAllAvailable()
    j.stop()
    println(s"[streaming] interval join: " +
      s"${spark.table("attrib_cli").count()} click→purchase attributions")

    // per-micro-batch quality monitoring routed through the alert manager
    val alertLog = s"$streamDir/alerts.jsonl"
    val mgr = new graft.checks.Alerts.AlertManager(
      new graft.checks.Alerts.FileNotifier(alertLog))
    val sent = graft.streaming.MonitorStream.monitorAvailableNow(
      spark, streamDir, schema,
      Seq(graft.checks.Checks.NotNull("event_type"),
        graft.checks.Checks.RowCountBetween(1)),
      mgr, s"$streamDir/_monitor_ckpt")
    println(s"[streaming] monitor: ${sent.size} alerts fired " +
      s"(${mgr.deliveryFailures} delivery failures) -> $alertLog")
    spark.stop()
  }
}
