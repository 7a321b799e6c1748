package graft

import graft.sources.Connectors
import graft.sources.Connectors.JdbcConfig

/** LIVE JDBC round-trip against embedded Derby (on the Spark classpath) —
  * the in-sandbox analog of the reference's testcontainers Postgres
  * acceptance rig (`tests/acceptance/conftest.py:35-61`): S2 (JDBC scan,
  * incl. the partitioned parallel-read path) and K4 (JDBC bulk write) run
  * against a real database engine, not just option-builder assertions.
  */
class JdbcConnectorSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val cfg = JdbcConfig(url = url, user = "app", password = "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn.createStatement()) finally conn.close()
  }

  private lazy val seeded: Unit = withStatement { st =>
    st.executeUpdate(
      """CREATE TABLE care_site (
        |  care_site_id INT PRIMARY KEY,
        |  care_site_name VARCHAR(100))""".stripMargin)
    (1 to 8).foreach(i => st.executeUpdate(
      s"INSERT INTO care_site VALUES ($i, 'Site $i')"))
  }

  test("S2: JDBC scan reads a live table") {
    seeded
    val df = Connectors.readJdbc(spark, cfg, "care_site")
    val rows = df.orderBy("CARE_SITE_ID").collect()
    assert(rows.length == 8)
    assert(rows.head.getInt(0) == 1 && rows.head.getString(1) == "Site 1")
  }

  test("S2: partition quad produces parallel range-partitioned reads") {
    seeded
    val parCfg = cfg.copy(partitionColumn = Some("care_site_id"),
      lowerBound = Some(1L), upperBound = Some(9L), numPartitions = Some(4))
    val df = Connectors.readJdbc(spark, parCfg, "care_site")
    assert(df.rdd.getNumPartitions == 4) // 4 concurrent range queries
    assert(df.count() == 8) // ranges partition, never drop rows
  }

  test("S2: filters and projection push into the remote query") {
    seeded
    val df = Connectors.readJdbc(spark, cfg, "care_site")
      .filter($"CARE_SITE_ID" > 5).select("CARE_SITE_NAME")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed to JDBC source:\n$plan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Site 6", "Site 7", "Site 8"))
  }

  test("K4: JDBC bulk write + read-back round-trip") {
    val out = Seq((1, "alpha", 10L), (2, "beta", 20L), (3, "gamma", 30L))
      .toDF("id", "name", "ts")
    Connectors.writeJdbc(out, cfg, "loaded_table", maxConnections = 2)
    val back = Connectors.readJdbc(spark, cfg, "loaded_table")
      .orderBy("ID").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq == Seq((1, "alpha", 10L), (2, "beta", 20L), (3, "gamma", 30L)))
    // append mode accumulates (the daily-load shape)
    Connectors.writeJdbc(Seq((4, "delta", 40L)).toDF("id", "name", "ts"),
      cfg, "loaded_table")
    assert(Connectors.readJdbc(spark, cfg, "loaded_table").count() == 4)
  }

  test("K4: keyed upsert is a live MERGE and replay-idempotent") {
    withStatement { st =>
      st.executeUpdate(
        """CREATE TABLE upsert_target (
          |  id INT PRIMARY KEY, val VARCHAR(50), ver BIGINT)""".stripMargin)
    }
    def state(): Seq[(Int, String, Long)] =
      Connectors.readJdbc(spark, cfg, "upsert_target").orderBy("ID")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq

    val b1 = Seq((1, "a", 1L), (2, "b", 1L)).toDF("id", "val", "ver")
    Connectors.upsertJdbc(b1, cfg, "upsert_target", keys = Seq("id"))
    assert(state() == Seq((1, "a", 1L), (2, "b", 1L)))

    // batch 2: update key 2, insert key 3
    val b2 = Seq((2, "b2", 2L), (3, "c", 2L)).toDF("id", "val", "ver")
    Connectors.upsertJdbc(b2, cfg, "upsert_target", keys = Seq("id"))
    assert(state() == Seq((1, "a", 1L), (2, "b2", 2L), (3, "c", 2L)))

    // checkpoint-replay of batch 2: identical final state, no duplicates
    Connectors.upsertJdbc(b2, cfg, "upsert_target", keys = Seq("id"))
    assert(state() == Seq((1, "a", 1L), (2, "b2", 2L), (3, "c", 2L)))

    // no leftover staging tables
    val tables = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (rs.next()) buf += rs.getString("TABLE_NAME")
        buf.toSeq
      } finally conn.close()
    }
    assert(!tables.exists(_.toLowerCase.contains("_stg_")),
      s"staging table leaked: $tables")
  }

  test("streaming CDC egress: foreachBatch upsert keeps latest-per-key") {
    withStatement { st =>
      st.executeUpdate(
        """CREATE TABLE egress_target (
          |  user_id BIGINT PRIMARY KEY, ver BIGINT)""".stripMargin)
    }
    val dir = tmpDir("jdbc-egress")
    Seq((1L, 1L), (2L, 1L), (1L, 2L)).toDF("user_id", "ver")
      .coalesce(1).write.parquet(s"$dir/drop/b1")
    val schema = Seq((1L, 1L)).toDF("user_id", "ver").schema
    val q = spark.readStream.schema(schema).parquet(s"$dir/drop/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = graft.sources.Debezium.latestPerKey(
          batch, Seq("user_id"), Seq(org.apache.spark.sql.functions.col("ver")))
        Connectors.upsertJdbc(latest, cfg, "egress_target", keys = Seq("user_id"))
        ()
      }
      .start()
    q.awaitTermination()
    val got = Connectors.readJdbc(spark, cfg, "egress_target").orderBy("USER_ID")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }

  test("K4: COPY-speed bulk load via the database's server-side import") {
    withStatement { st =>
      st.executeUpdate(
        """CREATE TABLE bulk_target (
          |  id BIGINT NOT NULL,
          |  label VARCHAR(50),
          |  score DOUBLE)""".stripMargin)
    }
    val n = 50000
    val df = (1 to n).map(i =>
      (i.toLong, s"label,with \"quotes\" $i", i * 0.5)).toDF(
      "id", "label", "score")
    val work = tmpDir("bulkload-csv")
    val files = Connectors.bulkLoadJdbc(df, cfg,
      f => s"CALL SYSCS_UTIL.SYSCS_IMPORT_TABLE(NULL, 'BULK_TARGET', " +
        s"'$f', NULL, NULL, NULL, 0)",
      work)
    assert(files >= 1)
    val back = Connectors.readJdbc(spark, cfg, "bulk_target")
    assert(back.count() == n)
    val row = back.filter($"ID" === 42L).collect().head
    assert(row.getString(1) == "label,with \"quotes\" 42" &&
      row.getDouble(2) == 21.0,
      "CSV quoting must survive the server-side import")
  }
}
