package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.SnapshotTable
import graft.sources.Debezium

/** Structured Streaming CDC ingestion — the native upgrade of the
  * reference's "micro-batch by scheduled re-run" model (SURVEY.md §2.9 ST3:
  * option (b)). `Trigger.AvailableNow` drains the backlog exactly once and
  * stops, which composes with any scheduler while keeping checkpointed
  * source offsets (files already processed are never re-read — the
  * exactly-once-ish upgrade of ST5) and an idempotent merge sink.
  *
  * The file JSONL source stands in for Kafka; with real Kafka the only
  * change is `readStream.format("kafka")` — the envelope handling and the
  * foreachBatch merge are identical. State never accumulates in the stream
  * itself (no watermark needed — ST4): latest-per-key lives in the merge
  * against the snapshot table, so a 1000-executor cluster only holds one
  * micro-batch in memory at a time.
  */
object CdcStream {

  /** Stream a JSONL topic-dump directory with the Kafka column contract
    * (`value`, `timestamp` — timestamp from the envelope's ts_ms for
    * determinism, like [[Debezium.readJsonl]]).
    *
    * `dir` may be a flat topic dump OR a partitioned one (`.jsonl`
    * files under `partition=N` subdirectories — the on-disk twin of a
    * Kafka topic's partitions; the glob recurses). Kafka orders WITHIN a partition
    * only, and so does this twin: cross-partition order is undefined,
    * which is why every consumer downstream keys on the envelope's
    * `ts_ms` rather than arrival order (pinned in CdcStreamSpec).
    *
    * `maxFilesPerTrigger` is the file-source analog of Kafka's
    * `maxOffsetsPerTrigger` (KafkaConfig): it bounds each micro-batch,
    * and `Trigger.AvailableNow` then drains the backlog as SEVERAL
    * batches instead of one. Results must be batching-invariant — the
    * merge sink is keyed and idempotent — which is the semantic the
    * contract spec pins before a real broker ever appears. */
  def readJsonlStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // A topic dump whose files lack the .jsonl extension (part-00000
    // style) would match the glob zero times and the stream would
    // "succeed" with 0 batches — fail loudly instead of ingesting nothing.
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(root)) {
      val walk = java.nio.file.Files.walk(root)
      try {
        val files = walk.iterator()
        var sawFile = false
        var sawJsonl = false
        while (files.hasNext && !sawJsonl) {
          val p = files.next()
          if (java.nio.file.Files.isRegularFile(p)) {
            sawFile = true
            if (p.getFileName.toString.endsWith(".jsonl")) sawJsonl = true
          }
        }
        require(!sawFile || sawJsonl,
          s"topic dump '$dir' contains files but none match *.jsonl — " +
            s"this source reads .jsonl files only; rename the dump or " +
            s"point at the right directory")
      } finally walk.close()
    }
    var r = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("pathGlobFilter", "*.jsonl")
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n =>
      r = r.option("maxFilesPerTrigger", n.toString))
    r.text(dir)
      .select(
        col("value"),
        timestamp_millis(get_json_object(col("value"), "$.payload.ts_ms").cast(LongType))
          .as("timestamp"))
  }

  /** Run the raw CDC stage as an AvailableNow stream: tombstone-filter +
    * raw-model shape each micro-batch, merge-upsert into `table` keyed by
    * `keyField` ordered by the CDC timestamp. Blocks until the backlog is
    * drained. Returns the number of micro-batches processed. */
  def ingestAvailableNow(spark: SparkSession, topicDir: String,
                         table: SnapshotTable, keyField: String,
                         checkpointDir: String,
                         partitionBy: Seq[String] = Seq("ingestion_cdc_date"),
                         quarantine: Option[SnapshotTable] = None,
                         rowSchema: Option[StructType] = None,
                         maxFilesPerTrigger: Option[Int] = None): Long = {
    var batches = 0L
    val q = readJsonlStream(spark, topicDir, maxFilesPerTrigger).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // garbage messages must not masquerade as tombstones (same rule
        // as the batch fleet pipeline)
        val (valid, malformed) = Debezium.splitMalformed(batch)
        quarantine.foreach { qt =>
          if (!malformed.isEmpty)
            qt.merge(malformed, Seq("raw_message"), Seq(col("raw_message")))
        }
        // declared row schema → single-parse typed path (~2× on the parse;
        // note nested_data is then the re-serialization of DECLARED fields,
        // not the verbatim after-image — same trade as CdcTablePipeline)
        val raw = rowSchema match {
          case Some(schema) =>
            Debezium.rawModelTyped(valid, keyField, schema).drop("after")
          case None => Debezium.rawModel(valid, keyField)
        }
        if (!raw.isEmpty) {
          table.merge(raw, Seq(keyField), Seq(col("cdc_ts_ms")), partitionBy)
        }
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
