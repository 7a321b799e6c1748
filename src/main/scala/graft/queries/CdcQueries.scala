package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Debezium, Tables}

/** Driver-visible CDC coverage: constructs Debezium envelopes from the
  * orders table, runs them through the SAME raw-model path the pipeline
  * uses (tombstone filter → after-image extraction → shred), and returns
  * typed columns that must equal a plain projection of the source — an
  * oracle-checked round-trip of SURVEY.md §2.9 ST1/ST2 semantics.
  */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  private val orderRow = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  /** Envelope → raw model → shred round-trip. Orders with orderkey ≡ 0
    * (mod 97) become tombstones (after=null) and must vanish — the ST2
    * "deletes never reach the lake" rule, checked by the oracle's
    * complementary WHERE. */
  def q21CdcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val after = struct($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val envelope = ord.select(
      to_json(struct(
        struct(
          when($"o_orderkey" % 97 === 0, lit(null).cast(orderRow)).otherwise(after)
            .as("after"),
          when($"o_orderkey" % 97 === 0, lit("d")).otherwise(lit("c")).as("op"),
          // o_orderdate is TIMESTAMP_NTZ in the parquet; UTC session makes
          // the cast to instant-typed TIMESTAMP an identity
          unix_millis($"o_orderdate".cast(TimestampType)).as("ts_ms")
        ).as("payload"))).as("value"),
      $"o_orderdate".as("timestamp"))
    val raw = Debezium.rawModel(envelope, "o_orderkey")
    Debezium.shred(raw.select("nested_data"), orderRow)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        floor($"o_totalprice" * 100.0 + 0.5).as("price_cents"))
      .orderBy($"o_orderkey")
  }

  /** SCD Type-2 dimension build: compress each user's event stream into
    * event_type validity intervals (§2.9 ST4's merge keeps only the latest
    * image; this is the full-history companion). One shuffle on user_id;
    * lag-detect + lead-close share the exchange (`ScdOps.scd2`). */
  def q85Scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val intervals = graft.ops.ScdOps.scd2(
      Tables.load(s, dir, "events").withColumn("ts_us", unix_micros($"ts")),
      keyCols = Seq("user_id"),
      orderCols = Seq($"ts", $"event_id"),
      attrCols = Seq("event_type"),
      validFrom = $"ts_us")
    intervals.select(
        $"user_id", $"event_type",
        $"valid_from".as("valid_from_us"),
        $"valid_to".as("valid_to_us"),
        $"is_current",
        $"event_id".as("change_event_id"))
      .orderBy($"user_id", $"valid_from_us", $"change_event_id")
  }

  /** Change-data-feed between two simulated snapshots of orders: v2 drops
    * keys ≡0 (mod 17), adds keys ≡0 (mod 13) missing from v1, and bumps
    * price for keys ≡0 (mod 5). `ScdOps.snapshotDiff` must emit exactly
    * the insert/update/delete rows — one full-outer join, integer-cents
    * arithmetic so the update detection is exact on both engines. */
  def q86SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.load(s, dir, "orders").select(
      $"o_orderkey", $"o_orderstatus",
      floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("price_cents"))
    val v1 = base.filter($"o_orderkey" % 13 =!= 0)
    val v2 = base.filter($"o_orderkey" % 17 =!= 0)
      .withColumn("price_cents",
        $"price_cents" + when($"o_orderkey" % 5 === 0, 100L).otherwise(0L))
    graft.ops.ScdOps.snapshotDiff(v1, v2, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  /** Structured Streaming driver gate (SURVEY.md §2.9 ST3): the events
    * table replayed through a file-sourced stream into
    * [[graft.streaming.EventStream.windowedTotals]] must equal the plain
    * batch GROUP BY the oracle runs — the stream/batch equivalence
    * contract. The stream is the real streaming operator (micro-batched
    * file source, stateful window aggregation, memory sink), not a batch
    * query dressed up. */
  def q124StreamWindowed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory (or glob) — the one-char glob
    // makes the parent dir the base path while matching only this file.
    val glob = s"$dir/events.parque[t]"
    graft.streaming.EventStream.runWindowedTotalsOnce(s, glob, schema)
      .orderBy($"window_start_s", $"event_type")
  }

  /** VARIANT ingestion (Spark 4's semi-structured type): JSON built from
    * orders → `parse_json` → typed `variant_get` path extraction, nested
    * object + array paths included. The oracle recomputes the extracted
    * values RELATIONALLY from the base table, so the gate proves the
    * JSON→VARIANT→extract round-trip is value-exact (doubles ride JSON's
    * shortest-repr printing, which re-parses to the identical bits).
    * Unlike the `from_json` shred (q21), VARIANT needs no schema up
    * front — the 100 TB pattern for heterogeneous event payloads: ingest
    * once as VARIANT, extract typed columns per consumer. */
  def q134VariantShred(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val j = to_json(struct(
      struct($"o_orderkey".as("id"),
        array($"o_custkey", pmod($"o_orderkey", lit(7))).as("ks")).as("meta"),
      $"o_orderstatus".as("st"),
      $"o_totalprice".as("price")))
    ord.select($"o_orderkey", parse_json(j).as("v"))
      .select($"o_orderkey",
        expr("variant_get(v, '$.meta.id', 'long')").as("meta_id"),
        expr("variant_get(v, '$.meta.ks[1]', 'long')").as("k2"),
        expr("variant_get(v, '$.st', 'string')").as("status"),
        floor(expr("variant_get(v, '$.price', 'double')") * 100.0 + 0.5)
          .as("price_cents"))
      .orderBy($"o_orderkey")
  }

  /** Full SQL-project lifecycle through the RunSqlProject CLI path
    * (q154): the committed 3-model fixture project on the classpath
    * (`src/main/resources/q154_project/` — merge + incremental raw
    * layer, ephemeral stats, tested curated aggregate) runs TWICE:
    * first on the docs with `doc_id <= max/2` (batch var 1), then on
    * the full table (batch var 2), where the second pass takes the
    * `is_incremental()` + `{{ this }}` path. The audit column
    * `loaded_batch` records which run FIRST admitted each row, so the
    * final curated hash fails if the incremental filter re-admits old
    * rows or drops new ones — the oracle computes the batch split
    * relationally from the same max/2 cut. */
  def q154SqlProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val cut = docs.agg(max($"doc_id")).head.getLong(0) / 2
    val modelsDir = java.nio.file.Files.createTempDirectory("q154-models")
    Seq("raw_docs.sql", "doc_stats.sql", "curated_langs.sql").foreach { f =>
      val in = getClass.getResourceAsStream(s"/q154_project/$f")
      require(in != null, s"fixture resource q154_project/$f missing")
      try java.nio.file.Files.copy(in, modelsDir.resolve(f))
      finally in.close()
    }
    val data = java.nio.file.Files.createTempDirectory("q154-data")
    docs.where($"doc_id" <= cut).write.mode("overwrite")
      .parquet(s"$data/batch1.parquet")
    val lake = java.nio.file.Files.createTempDirectory("q154-lake").toString
    def pass(batch: Int, sourcePath: String): Unit = {
      val conf = data.resolve(s"sources_$batch.conf")
      java.nio.file.Files.writeString(conf,
        s"documents parquet $sourcePath\n")
      val res = graft.RunSqlProject.run(Array(
        modelsDir.toString, lake,
        "--sources", conf.toString, "--vars", s"batch=$batch"), s)
      require(res.ok, s"q154 pass $batch failed: ${res.toJson}")
    }
    pass(1, s"$data/batch1.parquet")
    pass(2, s"$dir/documents.parquet")
    new graft.sinks.SnapshotTable(s, s"$lake/curated_langs").read()
      .select($"lang", $"loaded_batch", $"n_docs", $"total_chars",
        $"total_len", $"n_sources")
      .orderBy($"lang", $"loaded_batch")
  }

  /** Full CDC→curated pipeline through the STREAMING path (q172): the
    * q21 envelope set is laid out as a partitioned topic twin (4
    * `partition=N` dirs of .jsonl), drained by
    * [[graft.streaming.CdcStream.ingestAvailableNow]] in several
    * micro-batches (`maxFilesPerTrigger` bounds each), merge-upserted
    * into a snapshot table, then shredded and joined to the customer
    * dimension. q21 gates the envelope operators one-by-one and
    * CdcStreamSpec gates the stream pieces in isolation; this gate
    * proves the WHOLE chain (stream → merge → shred → dimension join)
    * is batch/stream-equivalent against the one-shot relational oracle. */
  def q172CdcStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val after = struct($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val envelope = ord.select(
      to_json(struct(
        struct(
          when($"o_orderkey" % 97 === 0, lit(null).cast(orderRow)).otherwise(after)
            .as("after"),
          when($"o_orderkey" % 97 === 0, lit("d")).otherwise(lit("c")).as("op"),
          unix_millis($"o_orderdate".cast(TimestampType)).as("ts_ms")
        ).as("payload"))).as("value"),
      pmod($"o_orderkey", lit(4)).as("partition"))
    val topic = java.nio.file.Files.createTempDirectory("q172topic").toString
    // ONE partitioned write lays out all four topic partitions
    // (partition=N dirs), then the data files take the .jsonl extension
    // the topic-twin source contract requires
    envelope.repartition(col("partition"))
      .write.mode("overwrite").partitionBy("partition").text(topic)
    // the topic's OWN filesystem, not fs.defaultFS — on a deployment
    // whose default is hdfs:// the temp dir is still local
    val topicPath = new org.apache.hadoop.fs.Path(topic)
    val fs = topicPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(topicPath, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith("part-") && !f.getName.endsWith(".jsonl"))
        fs.rename(f, new org.apache.hadoop.fs.Path(f.getParent,
          f.getName + ".jsonl"))
    }
    val lake = java.nio.file.Files.createTempDirectory("q172lake").toString
    val table = new graft.sinks.SnapshotTable(s, s"$lake/raw_orders")
    // unpartitioned raw table: orders' ts_ms spans ~7 years of distinct
    // dates, so the default date partitioning would write thousands of
    // one-row directories per merge — the date-layout semantics are
    // already gated by q13/q21; THIS gate is about the streaming chain
    val nBatches = graft.streaming.CdcStream.ingestAvailableNow(
      s, topic, table, "o_orderkey",
      checkpointDir = s"$lake/_checkpoint",
      partitionBy = Seq.empty,
      maxFilesPerTrigger = Some(2))
    require(nBatches >= 2,
      s"expected a multi-micro-batch drain, got $nBatches batches")
    val cust = Tables.load(s, dir, "customer").select($"c_custkey", $"c_name")
    Debezium.shred(table.read().select("nested_data"), orderRow)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        floor($"o_totalprice" * 100.0 + 0.5).as("price_cents"))
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"price_cents", $"c_name")
      .orderBy($"o_orderkey")
  }

  /** CDC deletes maintained THROUGH a join, streaming (q182): a
    * Debezium topic twin carrying three waves — inserts for every
    * order, an update wave (`o_orderkey % 5 = 0` re-statused to 'X',
    * before-image = the inserted row), a delete wave
    * (`o_orderkey % 7 = 0`, before-image = current state) — is drained
    * by [[graft.streaming.JoinStream.drainCdcSignedAvailableNow]] into
    * [[graft.ops.IncrementalJoin]] as SIGNED deltas (c→+after,
    * u→−before+after, d→−before) against a customer dimension appended
    * once on the other side. The reference's CDC raw layer DROPS
    * deletes (`raw_provider_postgres.sql:22`), so a takedown never
    * reaches its joins; here the maintained multiset nets deleted
    * orders to zero and updated orders to exactly their new image, at
    * delta cost per micro-batch — the oracle is the one-shot join over
    * the FINAL table state. Signed deltas commute, so the gate holds
    * under ANY file-to-micro-batch carving (`maxFilesPerTrigger=1`
    * forces ≥3). */
  def q182CdcSignedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val row = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType)))
    val ord = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    val base = struct($"o_orderkey", $"o_custkey", $"o_orderstatus")
    val updated = struct($"o_orderkey", $"o_custkey",
      lit("X").as("o_orderstatus"))
    def env(before: Column, after: Column, op: String, wave: Int) =
      to_json(struct(struct(
        before.as("before"), after.as("after"),
        lit(op).as("op"), lit(wave.toLong).as("ts_ms")).as("payload")))
    val nullRow = lit(null).cast(row)
    val inserts = ord.select(
      env(nullRow, base, "c", 0).as("value"), lit(0).as("partition"))
    val updates = ord.where($"o_orderkey" % 5 === 0).select(
      env(base, updated, "u", 1).as("value"), lit(1).as("partition"))
    val deletes = ord.where($"o_orderkey" % 7 === 0).select(
      env(when($"o_orderkey" % 5 === 0, updated).otherwise(base),
        nullRow, "d", 2).as("value"), lit(2).as("partition"))
    val topic = java.nio.file.Files.createTempDirectory("q182topic").toString
    inserts.unionByName(updates).unionByName(deletes)
      .repartition(col("partition"))
      .write.mode("overwrite").partitionBy("partition").text(topic)
    val topicPath = new org.apache.hadoop.fs.Path(topic)
    val fs = topicPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(topicPath, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith("part-") && !f.getName.endsWith(".jsonl"))
        fs.rename(f, new org.apache.hadoop.fs.Path(f.getParent,
          f.getName + ".jsonl"))
    }
    val root = java.nio.file.Files.createTempDirectory("q182ivm").toString
    val st = graft.ops.IncrementalJoin.stores(s, root)
    val cust = Tables.load(s, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    graft.ops.IncrementalJoin.appendRight(st, cust, Seq("o_custkey"), 0L)
    val nBatches = graft.streaming.JoinStream.drainCdcSignedAvailableNow(
      s, topic, row, st, Seq("o_custkey"), isLeft = true,
      checkpointDir = s"$root/_checkpoint",
      maxFilesPerTrigger = Some(1))
    require(nBatches >= 3,
      s"expected one micro-batch per wave file at least, got $nBatches")
    graft.ops.IncrementalJoin.current(st)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"c_mktsegment", $"n")
      .orderBy($"o_orderkey")
  }

  /** CDC → join MV → dashboard aggregate, streaming (q185): q182's
    * three-wave Debezium topic (inserts for every order, `%5` updates
    * re-statused to 'X', `%7` deletes) drained by [[graft.streaming
    * .JoinStream.drainCdcChainAvailableNow]] into a [[graft.ops
    * .ChainedIvm]] — each micro-batch's signed deltas ride the join
    * Δ-rule against the customer dimension AND flow on into the
    * maintained per-(mktsegment, status) revenue aggregate, so the
    * dashboard read at the end folds per-key partials only: it never
    * touches join state, raw orders, or the topic. This is the full
    * pipeline the reference runs as Debezium → Kafka → Trino models →
    * dbt marts, kept current END-TO-END at delta cost per micro-batch,
    * WITH the deletes its raw layer drops. Oracle = the one-shot
    * aggregate over the final table state. */
  def q185CdcChain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val row = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("price_cents", LongType)))
    val ord = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("price_cents"))
    val base = struct($"o_orderkey", $"o_custkey", $"o_orderstatus",
      $"price_cents")
    val updated = struct($"o_orderkey", $"o_custkey",
      lit("X").as("o_orderstatus"), $"price_cents")
    def env(before: Column, after: Column, op: String, wave: Int) =
      to_json(struct(struct(
        before.as("before"), after.as("after"),
        lit(op).as("op"), lit(wave.toLong).as("ts_ms")).as("payload")))
    val nullRow = lit(null).cast(row)
    val inserts = ord.select(
      env(nullRow, base, "c", 0).as("value"), lit(0).as("partition"))
    val updates = ord.where($"o_orderkey" % 5 === 0).select(
      env(base, updated, "u", 1).as("value"), lit(1).as("partition"))
    val deletes = ord.where($"o_orderkey" % 7 === 0).select(
      env(when($"o_orderkey" % 5 === 0, updated).otherwise(base),
        nullRow, "d", 2).as("value"), lit(2).as("partition"))
    val topic = java.nio.file.Files.createTempDirectory("q185topic").toString
    inserts.unionByName(updates).unionByName(deletes)
      .repartition(col("partition"))
      .write.mode("overwrite").partitionBy("partition").text(topic)
    val topicPath = new org.apache.hadoop.fs.Path(topic)
    val fs = topicPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(topicPath, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith("part-") && !f.getName.endsWith(".jsonl"))
        fs.rename(f, new org.apache.hadoop.fs.Path(f.getParent,
          f.getName + ".jsonl"))
    }
    val root = java.nio.file.Files.createTempDirectory("q185chain").toString
    val chain = graft.ops.ChainedIvm.stores(s, root, Seq("o_custkey"),
      graft.ops.IncrementalAgg.Spec(
        Seq("c_mktsegment", "o_orderstatus"), Seq("price_cents")))
    val cust = Tables.load(s, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    graft.ops.ChainedIvm.appendRight(chain, cust, 0L)
    val nBatches = graft.streaming.JoinStream.drainCdcChainAvailableNow(
      s, topic, row, chain, isLeft = true,
      checkpointDir = s"$root/_checkpoint",
      maxFilesPerTrigger = Some(1))
    require(nBatches >= 3,
      s"expected one micro-batch per wave file at least, got $nBatches")
    graft.ops.ChainedIvm.currentAgg(chain)
      .select($"c_mktsegment", $"o_orderstatus",
        $"n_rows".as("n_orders"), $"sum_price_cents".as("sum_cents"))
      .orderBy($"c_mktsegment", $"o_orderstatus")
  }

  /** CDC → n-ary dashboard (q208): TWO signed Debezium topics — orders
    * (insert + delete waves) and customer (insert + takedown waves) —
    * drained into ONE maintained three-way join tree
    * (`orders ⋈ customer ⋈ nation`, [[graft.ops.JoinTreeIvm]]) with a
    * maintained `n_name → count, sum(cents)` aggregate downstream: the
    * multi-source CDC pipeline whose dashboard stays current at delta
    * cost per micro-batch, end to end. Each topic drains AvailableNow
    * file-by-file (≥2 micro-batches each, asserted), sequentially
    * (single-writer stores); the Δ-rule cascade makes the final state
    * invariant to the drain interleaving. A customer takedown must
    * retract every joined order through BOTH levels and the aggregate.
    * Oracle = the 3-way join + GROUP BY over the net tables. */
  def q208CdcTree(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def mkTopic(prefix: String, waves: DataFrame): String = {
      val topic =
        java.nio.file.Files.createTempDirectory(prefix).toString
      waves.repartition(col("partition"))
        .write.mode("overwrite").partitionBy("partition").text(topic)
      val topicPath = new org.apache.hadoop.fs.Path(topic)
      val fs = topicPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(topicPath, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.startsWith("part-") && !f.getName.endsWith(".jsonl"))
          fs.rename(f, new org.apache.hadoop.fs.Path(f.getParent,
            f.getName + ".jsonl"))
      }
      topic
    }
    def env(before: Column, after: Column, op: String, wave: Int) =
      to_json(struct(struct(
        before.as("before"), after.as("after"),
        lit(op).as("op"), lit(wave.toLong).as("ts_ms")).as("payload")))

    val factRow = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("price_cents", LongType)))
    val ord = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("price_cents"))
    val factBase = struct($"o_orderkey", $"o_custkey", $"price_cents")
    val factNull = lit(null).cast(factRow)
    val factTopic = mkTopic("q208fact", ord.select(
        env(factNull, factBase, "c", 0).as("value"), lit(0).as("partition"))
      .unionByName(ord.where($"o_orderkey" % 7 === 0).select(
        env(factBase, factNull, "d", 1).as("value"), lit(1).as("partition"))))

    val custRow = StructType(Seq(
      StructField("o_custkey", LongType),
      StructField("c_nationkey", LongType)))
    val cust = Tables.load(s, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_nationkey")
    val custBase = struct($"o_custkey", $"c_nationkey")
    val custNull = lit(null).cast(custRow)
    val custTopic = mkTopic("q208cust", cust.select(
        env(custNull, custBase, "c", 0).as("value"), lit(0).as("partition"))
      .unionByName(cust.where($"o_custkey" % 13 === 0).select(
        env(custBase, custNull, "d", 1).as("value"), lit(1).as("partition"))))

    val root = java.nio.file.Files.createTempDirectory("q208tree").toString
    val tree = graft.ops.JoinTreeIvm.stores(s, root,
      Seq(Seq("o_custkey"), Seq("c_nationkey")),
      aggSpec = Some(graft.ops.IncrementalAgg.Spec(
        Seq("n_name"), Seq("price_cents"))))
    val nat = Tables.load(s, dir, "nation")
      .select($"n_nationkey".as("c_nationkey"), $"n_name")
    graft.ops.JoinTreeIvm.appendLeaf(tree, 2, nat, 0L)
    val nCust = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      s, custTopic, custRow, tree, leaf = 1,
      checkpointDir = s"$root/_ckpt_cust", maxFilesPerTrigger = Some(1))
    val nFact = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      s, factTopic, factRow, tree, leaf = 0,
      checkpointDir = s"$root/_ckpt_fact", maxFilesPerTrigger = Some(1))
    require(nCust >= 2 && nFact >= 2,
      s"expected one micro-batch per wave file at least: cust=$nCust " +
        s"fact=$nFact")
    graft.ops.JoinTreeIvm.currentAgg(tree)
      .select($"n_name", $"n_rows".as("n_orders"),
        $"sum_price_cents".as("sum_cents"))
      .orderBy($"n_name")
  }

  /** CDC → MID-outer enrichment dashboard (q216): the q211/q215 shape
    * (`lineitem ⟕ supplier ⟕ part`, LEFT OUTER at BOTH levels, both
    * keys fact-derived) maintained FROM SIGNED DEBEZIUM TOPICS at
    * micro-batch cadence, with cross-surface read atomicity. The fact
    * topic drains insert + takedown waves onto a tree whose supplier
    * dim is only PARTIALLY seeded — most facts start life
    * null-extended at level 0 — then the supplier topic's late-insert
    * wave flips them to matched THROUGH level 1 and into the
    * maintained (snk, psize) aggregate, and its delete wave flips a
    * slice back. Every micro-batch commits ONE [[graft.sinks.StoreSetRef]]
    * over the tree's serving surfaces (the drain's `setRef` hook), and
    * the final read goes through a PINNED snapshot —
    * [[graft.ops.JoinTreeIvm.pinnedView]] — so the dashboard can never
    * see the aggregate ahead of the multiset. The two drains use
    * disjoint id offsets ([[graft.streaming.JoinStream]] drain claims
    * enforce it). Result folds agg PARTIALS only; oracle = the
    * one-shot chained LEFT JOIN GROUP BY over net inputs. */
  def q216CdcMidTreeOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Waves are written SEQUENTIALLY with strictly increasing mtimes:
    // the file stream orders micro-batches by file timestamp, and a
    // one-shot partitioned write gives every wave file the same stamp —
    // ties order arbitrarily, and an outer tree (unlike the
    // commutative inner signed folds) REFUSES a delete wave that
    // arrives before its inserts (net key counts must never go
    // negative mid-stream). CDC topic semantics promise in-order
    // delivery per key; the fixture must too.
    def mkTopic(prefix: String, waves: Seq[DataFrame]): String = {
      val topic =
        java.nio.file.Files.createTempDirectory(prefix).toString
      val topicPath = new org.apache.hadoop.fs.Path(topic)
      val fs = topicPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val t0 = System.currentTimeMillis()
      waves.zipWithIndex.foreach { case (w, i) =>
        val waveDir = new org.apache.hadoop.fs.Path(topic, s"_w$i")
        w.coalesce(1).write.mode("overwrite").text(waveDir.toString)
        val it = fs.listFiles(waveDir, false)
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.startsWith("part-")) {
            val dst = new org.apache.hadoop.fs.Path(topicPath,
              s"wave$i.jsonl")
            fs.rename(f, dst)
            fs.setTimes(dst, t0 + i * 60000L, -1L)
          }
        }
        fs.delete(waveDir, true)
      }
      topic
    }
    def env(before: Column, after: Column, op: String, wave: Int) =
      to_json(struct(struct(
        before.as("before"), after.as("after"),
        lit(op).as("op"), lit(wave.toLong).as("ts_ms")).as("payload")))

    val factRow = StructType(Seq(
      StructField("sk", LongType), StructField("pk", LongType),
      StructField("cents", LongType)))
    val fact = Tables.load(s, dir, "lineitem")
      .filter($"l_orderkey" % 4 === 0)
      .select($"l_orderkey".as("okey"), $"l_suppkey".as("sk"),
        $"l_partkey".as("pk"),
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("cents"))
    val factBase = struct($"sk", $"pk", $"cents")
    val factNull = lit(null).cast(factRow)
    val factTopic = mkTopic("q216fact", Seq(
      fact.select(env(factNull, factBase, "c", 0).as("value")),
      fact.where($"okey" % 13 === 1)
        .select(env(factBase, factNull, "d", 1).as("value"))))

    val supRow = StructType(Seq(
      StructField("sk", LongType), StructField("snk", LongType)))
    val supp = Tables.load(s, dir, "supplier")
      .select($"s_suppkey".as("sk"), $"s_nationkey".cast("long").as("snk"))
    val supBase = struct($"sk", $"snk")
    val supNull = lit(null).cast(supRow)
    val supTopic = mkTopic("q216sup", Seq(
      supp.where($"sk" % 4 =!= 0)
        .select(env(supNull, supBase, "c", 0).as("value")),
      supp.where($"sk" % 7 === 3)
        .select(env(supBase, supNull, "d", 1).as("value"))))

    val root = java.nio.file.Files.createTempDirectory("q216tree").toString
    val tree = graft.ops.JoinTreeIvm.stores(s, root,
      Seq(Seq("sk"), Seq("pk")), outerLevels = Seq(0), outerLast = true,
      aggSpec = Some(graft.ops.IncrementalAgg.Spec(
        Seq("snk", "psize"), Seq("cents"))))
    val ref = new graft.sinks.StoreSetRef(s, s"$root/_refs",
      graft.ops.JoinTreeIvm.serveSurfaces(tree))
    // direct seeds: the PARTIAL supplier slice (sk % 4 == 0 — the rest
    // arrives late over the topic) and the permanently-partial part dim
    val part = Tables.load(s, dir, "part")
      .filter($"p_partkey" % 3 === 0)
      .select($"p_partkey".as("pk"), $"p_size".cast("long").as("psize"))
    graft.ops.JoinTreeIvm.appendLeaf(tree, 1, supp.filter($"sk" % 4 === 0), 0L)
    graft.ops.JoinTreeIvm.appendLeaf(tree, 2, part, 1L)
    ref.commit()
    val nFact = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      s, factTopic, factRow, tree, leaf = 0,
      checkpointDir = s"$root/_ckpt_fact", maxFilesPerTrigger = Some(1),
      setRef = Some(ref))
    // the supplier topic drains AFTER the facts: its insert file is the
    // late-dim wave (null→matched flips across level 1 into the agg),
    // its delete file the flip-back; disjoint id space via idOffset
    val nSup = graft.streaming.JoinStream.drainCdcTreeLeafAvailableNow(
      s, supTopic, supRow, tree, leaf = 1,
      checkpointDir = s"$root/_ckpt_sup", idOffset = 1000L,
      maxFilesPerTrigger = Some(1), setRef = Some(ref))
    require(nFact >= 2 && nSup >= 2,
      s"expected one micro-batch per wave file at least: fact=$nFact " +
        s"sup=$nSup")
    // the dashboard read: every surface pinned to the LAST committed
    // ref — the aggregate can never be observed ahead of the multiset
    val pinned = graft.ops.JoinTreeIvm.pinnedView(tree, ref.snapshot())
    graft.ops.JoinTreeIvm.currentAgg(pinned)
      .select(coalesce($"snk", lit(-1L)).as("snk"),
        coalesce($"psize", lit(-1L)).as("psize"),
        $"n_rows", $"sum_cents")
      .orderBy($"snk", $"psize")
  }

  val queries: Map[String, Q] = Map(
    "q216_cdc_midtree_outer" -> (q216CdcMidTreeOuter _),
    "q208_cdc_tree" -> (q208CdcTree _),
    "q185_cdc_chain" -> (q185CdcChain _),
    "q182_cdc_signed_join" -> (q182CdcSignedJoin _),
    "q172_cdc_stream" -> (q172CdcStream _),
    "q154_sql_project" -> (q154SqlProject _),
    "q21_cdc_roundtrip" -> (q21CdcRoundtrip _),
    "q134_variant_shred" -> (q134VariantShred _),
    "q85_scd2" -> (q85Scd2 _),
    "q86_snapshot_diff" -> (q86SnapshotDiff _),
    "q124_stream_windowed" -> (q124StreamWindowed _)
  )

  val oracles: Map[String, String] = Map(
    // q216: one-shot chained LEFT JOIN over the net topic contents —
    // facts minus the okey % 13 takedown, suppliers minus the sk % 7
    // delete wave, the part dim permanently partial (pk % 3 == 0)
    "q216_cdc_midtree_outer" ->
      """WITH f AS (SELECT l_suppkey sk, l_partkey pk,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) cents
        |  FROM lineitem WHERE l_orderkey % 4 = 0
        |    AND l_orderkey % 13 <> 1),
        |sup AS (SELECT s_suppkey sk, CAST(s_nationkey AS BIGINT) snk
        |  FROM supplier WHERE s_suppkey % 7 <> 3),
        |prt AS (SELECT p_partkey pk, CAST(p_size AS BIGINT) psize
        |  FROM part WHERE p_partkey % 3 = 0)
        |SELECT CAST(coalesce(s.snk, -1) AS BIGINT) AS snk,
        |  CAST(coalesce(p.psize, -1) AS BIGINT) AS psize,
        |  count(*) AS n_rows,
        |  CAST(sum(f.cents) AS BIGINT) AS sum_cents
        |FROM f LEFT JOIN sup s ON f.sk = s.sk
        |  LEFT JOIN prt p ON f.pk = p.pk
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q208_cdc_tree" ->
      """SELECT n.n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderkey % 7 <> 0 AND c.c_custkey % 13 <> 0
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
    "q185_cdc_chain" ->
      """SELECT c.c_mktsegment,
        |  CASE WHEN o.o_orderkey % 5 = 0 THEN 'X' ELSE o.o_orderstatus
        |    END AS o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 7 <> 0
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q182_cdc_signed_join" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CASE WHEN o.o_orderkey % 5 = 0 THEN 'X' ELSE o.o_orderstatus
        |    END AS o_orderstatus,
        |  c.c_mktsegment, CAST(1 AS BIGINT) AS n
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 7 <> 0
        |ORDER BY o.o_orderkey""".stripMargin,
    "q172_cdc_stream" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
        |  CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |  c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 97 <> 0
        |ORDER BY o.o_orderkey""".stripMargin,
    "q154_sql_project" ->
      """WITH raw AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    CASE WHEN doc_id <= (SELECT max(doc_id) // 2 FROM documents)
        |         THEN CAST(1 AS BIGINT) ELSE CAST(2 AS BIGINT) END
        |      AS loaded_batch
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, lang, source, loaded_batch, n_chars,
        |    length(text) AS text_len
        |  FROM raw)
        |SELECT lang, loaded_batch, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(text_len) AS BIGINT) AS total_len,
        |  count(DISTINCT source) AS n_sources
        |FROM stats
        |GROUP BY lang, loaded_batch
        |ORDER BY lang, loaded_batch""".stripMargin,
    "q134_variant_shred" ->
      """SELECT o_orderkey, o_orderkey AS meta_id, o_orderkey % 7 AS k2,
        |  o_orderstatus AS status,
        |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q21_cdc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE o_orderkey % 97 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "q85_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), c AS (
        |  SELECT user_id, event_id, event_type, ts_us FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_type,
        |  ts_us AS valid_from_us,
        |  lead(ts_us) OVER w AS valid_to_us,
        |  (lead(ts_us) OVER w IS NULL) AS is_current,
        |  event_id AS change_event_id
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, valid_from_us, change_event_id""".stripMargin,
    "q86_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        |  FROM orders
        |), v1 AS (
        |  SELECT * FROM base WHERE o_orderkey % 13 <> 0
        |), v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    price_cents + CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END
        |      AS price_cents
        |  FROM base WHERE o_orderkey % 17 <> 0
        |)
        |SELECT coalesce(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
        |  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |       WHEN v2.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  coalesce(v2.o_orderstatus, v1.o_orderstatus) AS o_orderstatus,
        |  coalesce(v2.price_cents, v1.price_cents) AS price_cents
        |FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        |WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
        |   OR v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
        |   OR v1.price_cents IS DISTINCT FROM v2.price_cents
        |ORDER BY o_orderkey""".stripMargin,
    "q124_stream_windowed" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300
        |    AS window_start_s,
        |  event_type, count(*) AS n,
        |  CAST(sum(floor(value * 100.0 + 0.5)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_s, event_type""".stripMargin
  )
}
