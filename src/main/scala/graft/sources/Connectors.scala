package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-system source wrappers (SURVEY.md §2.1 S1/S2): thin,
  * config-to-options layers over Spark's built-in connectors so the option
  * maps are unit-testable pure functions even where the external system
  * isn't present in the test environment.
  *
  * Test posture: the JDBC paths (S2 scan incl. partitioned parallel
  * reads + pushdown, K4 bulk write) are LIVE-tested against embedded
  * Derby in JdbcConnectorSpec — the in-sandbox analog of the reference's
  * testcontainers Postgres rig. The Kafka paths cannot be live-tested
  * here: this environment has no Kafka broker and no kafka-clients /
  * spark-sql-kafka jars (zero-egress container), so S1/S5 are covered by
  * the option-builder unit tests plus [[Debezium.readJsonl]], a file
  * stand-in producing the identical (value, timestamp, key, topic) column
  * contract that the whole downstream CDC path consumes. On a real
  * deployment, `readKafka`/`readKafkaStream` are one spark-sql-kafka jar
  * away from live, with no downstream changes.
  */
object Connectors {

  /** JDBC scan config (reference `postgresql.properties`, S2). For scale,
    * always provide the partition quad — without it Spark reads the whole
    * table through ONE connection; with it, `numPartitions` parallel
    * range-partitioned queries, and Catalyst pushes filters/projections
    * into the remote SQL. */
  final case class JdbcConfig(
      url: String, user: String, password: String,
      driver: String = "org.postgresql.Driver",
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None, upperBound: Option[Long] = None,
      numPartitions: Option[Int] = None, fetchSize: Int = 10000)

  def jdbcOptions(cfg: JdbcConfig, dbtable: String): Map[String, String] =
    Map(
      "url" -> cfg.url, "dbtable" -> dbtable, "user" -> cfg.user,
      "password" -> cfg.password, "driver" -> cfg.driver,
      "fetchsize" -> cfg.fetchSize.toString) ++
      cfg.partitionColumn.map("partitionColumn" -> _) ++
      cfg.lowerBound.map("lowerBound" -> _.toString) ++
      cfg.upperBound.map("upperBound" -> _.toString) ++
      cfg.numPartitions.map("numPartitions" -> _.toString)

  def readJdbc(spark: SparkSession, cfg: JdbcConfig, dbtable: String): DataFrame =
    spark.read.format("jdbc").options(jdbcOptions(cfg, dbtable)).load()

  /** JDBC bulk write (reference K4 — the COPY-based fixture loader role).
    * `batchsize` maps to executor-side batched inserts; `numPartitions`
    * bounds concurrent connections against the database. */
  def writeJdbc(df: DataFrame, cfg: JdbcConfig, dbtable: String,
                mode: String = "append", batchSize: Int = 10000,
                maxConnections: Int = 8): Unit =
    df.coalesce(maxConnections)
      .write.format("jdbc")
      .options(jdbcOptions(cfg, dbtable) +
        ("batchsize" -> batchSize.toString))
      .mode(mode)
      .save()

  /** Idempotent keyed upsert into a JDBC table: the batch bulk-loads into
    * a unique staging table ([[writeJdbc]] — parallel batched inserts),
    * then ONE server-side `MERGE INTO` applies it to the target keyed on
    * `keys`, and the staging table is dropped. This is the
    * `foreachBatch` JDBC sink pattern for exactly-once-ish CDC egress:
    * a checkpoint-replayed micro-batch re-merges the same rows into the
    * same keys, so replays cannot duplicate. The target table (with its
    * key constraint) must already exist — DDL is the operator's domain,
    * as with the reference's managed sink tables.
    *
    * Scale posture: data moves executor→DB in parallel batched inserts
    * (never through the driver); the driver issues only the constant-size
    * MERGE/DROP statements. */
  def upsertJdbc(df: DataFrame, cfg: JdbcConfig, table: String,
                 keys: Seq[String], batchSize: Int = 10000,
                 maxConnections: Int = 8): Unit = {
    require(keys.nonEmpty, "upsertJdbc needs at least one key column")
    val staging = s"${table}_stg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    writeJdbc(df, cfg, staging, mode = "overwrite", batchSize, maxConnections)
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    // Spark's JDBC writer CREATEs the staging table with QUOTED column
    // names (case-preserved); the target's come from operator DDL and
    // fold to the database's default case — so staging references are
    // quoted verbatim, target references unquoted.
    def sq(c: String) = "s.\"" + c + "\""
    val on = keys.map(k => s"t.$k = ${sq(k)}").mkString(" AND ")
    val setClause = nonKeys.map(c => s"t.$c = ${sq(c)}").mkString(", ")
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(sq).mkString(", ")
    val matched =
      if (nonKeys.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $setClause "
    val mergeSql =
      s"MERGE INTO $table t USING $staging s ON ($on) " + matched +
        s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val st = conn.createStatement()
      try {
        st.executeUpdate(mergeSql)
      } finally {
        try st.executeUpdate(s"DROP TABLE $staging")
        finally st.close()
      }
    } finally conn.close()
  }

  /** COPY-speed bulk load (reference `datagen.py:192-203` seeds 2M rows
    * via `COPY FROM STDIN`, not INSERTs): the batch lands as CSV part
    * files, and the DATABASE's own bulk-import path loads each in ONE
    * server-side call — no per-row statement/latch overhead, the same
    * bargain COPY offers. The `importSql` template adapts per engine:
    *
    *  - Derby (spec'd live):
    *    `CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(NULL, 'T', '<file>', NULL, NULL, NULL, 0)`
    *  - Postgres: `COPY t FROM '<file>' WITH (FORMAT csv)`
    *
    * Spark CSV defaults (comma delimiter, double-quote character) match
    * both engines' import defaults. The CSV detour costs one
    * materialization but moves row encoding OFF the database connection;
    * for fixture-loader volumes (the reference's role for COPY) that is
    * the right trade. Returns the number of files imported. */
  def bulkLoadJdbc(df: DataFrame, cfg: JdbcConfig,
                   importSql: String => String, workDir: String): Long = {
    df.write.mode("overwrite")
      .option("header", "false")
      .option("emptyValue", "")
      // standard-CSV doubled quotes ("") — Spark's default backslash
      // escape is a dialect neither COPY nor SYSCS_IMPORT accepts
      .option("escape", "\"")
      .csv(workDir)
    val files = new java.io.File(workDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .map(_.getAbsolutePath).sorted
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user,
      cfg.password)
    try {
      val st = conn.createStatement()
      try files.foreach(f => st.execute(importSql(f)))
      finally st.close()
    } finally conn.close()
    files.length.toLong
  }

  /** Kafka batch-scan config (reference kafka connector, S1). Produces the
    * (value, timestamp, key) column contract that [[Debezium.rawModel]]
    * and the key-scan (S5) consume. */
  final case class KafkaConfig(
      bootstrapServers: String,
      startingOffsets: String = "earliest",
      endingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None)

  def kafkaOptions(cfg: KafkaConfig, topics: Seq[String]): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> cfg.startingOffsets,
      "endingOffsets" -> cfg.endingOffsets) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Batch Kafka read → Debezium column contract. The raw `value` bytes
    * cast to string (schemas disabled = plain JSON, reference
    * docker-compose.yaml:154-155); `timestamp` is broker arrival time
    * (Trino's `_timestamp`); `key` the JSON key (`provider_id_key`, S5). */
  def readKafka(spark: SparkSession, cfg: KafkaConfig, topics: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("kafka").options(kafkaOptions(cfg, topics)).load()
      .select(
        col("value").cast("string").as("value"),
        col("timestamp"),
        col("key").cast("string").as("key"),
        col("topic"))
  }

  /** Streaming variant with identical downstream contract. */
  def readKafkaStream(spark: SparkSession, cfg: KafkaConfig, topics: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.readStream.format("kafka")
      .options(kafkaOptions(cfg, topics) - "endingOffsets").load()
      .select(
        col("value").cast("string").as("value"),
        col("timestamp"),
        col("key").cast("string").as("key"),
        col("topic"))
  }
}
