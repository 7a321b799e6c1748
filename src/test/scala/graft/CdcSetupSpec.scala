package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{CdcSetup, Connectors}
import graft.sources.CdcSetup.ConnectorSpec
import graft.sources.Connectors.JdbcConfig

/** D5/D6 (SURVEY.md §2.10): CDC-enable DDL and Debezium connector
  * registration — live-tested in-sandbox: the DDL executor runs against
  * embedded Derby (a real database), the REST registration against a real
  * in-JVM HTTP server (`com.sun.net.httpserver`), mirroring the
  * reference's setup flow (`postgres.py:33-69`, `setup.py:67-99`) without
  * needing Postgres or Kafka Connect containers.
  */
class CdcSetupSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ D5 generators

  test("D5: enableCdcDdl emits replication grant + read-all grant") {
    val ddl = CdcSetup.enableCdcDdl("test")
    assert(ddl == Seq(
      """ALTER ROLE "test" WITH REPLICATION""",
      """GRANT pg_read_all_data TO "test""""))
  }

  test("D5: publicationDdl is guarded on pg_publication (idempotent)") {
    val ddl = CdcSetup.publicationDdl("provider")
    assert(ddl.contains("IF NOT EXISTS"))
    assert(ddl.contains("FROM pg_publication WHERE pubname = 'provider_publication'"))
    assert(ddl.contains("""CREATE PUBLICATION "provider_publication" FOR TABLE "provider""""))
    assert(ddl.startsWith("DO $$") && ddl.endsWith("END$$"))
    // explicit publication name override (setup.py:80 uses healthcare_pub)
    assert(CdcSetup.publicationDdl("provider", Some("healthcare_pub"))
      .contains("""CREATE PUBLICATION "healthcare_pub""""))
  }

  test("D5: disable + wal-level probe match the reference surface") {
    assert(CdcSetup.isCdcEnabledSql == "SHOW wal_level")
    assert(CdcSetup.disableCdcDdl.head.contains("wal_level = replica"))
    assert(CdcSetup.disableCdcDdl(1).contains("pg_reload_conf"))
  }

  // ------------------------------------------------------------ D5 live DDL

  private val derby = JdbcConfig(
    url = "jdbc:derby:memory:cdcsetupdb;create=true", user = "app",
    password = "app", driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("D5: executeDdl runs statements live over JDBC autocommit") {
    val n = CdcSetup.executeDdl(derby, Seq(
      "CREATE TABLE cdc_flags (tbl VARCHAR(50), enabled INT)",
      "INSERT INTO cdc_flags VALUES ('provider', 1)",
      "INSERT INTO cdc_flags VALUES ('care_site', 1)"))
    assert(n == 3)
    val back = Connectors.readJdbc(spark, derby, "cdc_flags")
    assert(back.count() == 2)
  }

  test("D5: executeDdl fails fast on bad statements (partial setup visible)") {
    intercept[java.sql.SQLException] {
      CdcSetup.executeDdl(derby, Seq("CREATE GIBBERISH"))
    }
  }

  // ------------------------------------------------------ D6 payload contract

  private val spec = ConnectorSpec(
    name = "postgres-cdc",
    databaseHostname = "postgres_medical", databasePort = 5432,
    databaseUser = "test", databasePassword = "test",
    databaseDbname = "test", databaseServerName = "medical_server",
    tableIncludeList = Seq("public.provider", "public.care_site"),
    publicationName = "healthcare_pub")

  test("D6: connectorPayload carries the reference's exact config keys") {
    val payload = CdcSetup.connectorPayload(spec)
    // parse with Spark's JSON reader: proves well-formed JSON, not just text
    val df = spark.read.json(Seq(payload).toDS)
    assert(df.select("name").as[String].head() == "postgres-cdc")
    val cfg = df.select("config.*")
    val row = cfg.head()
    val got = cfg.columns.zip(row.toSeq.map(_.toString)).toMap
    assert(got("connector.class") ==
      "io.debezium.connector.postgresql.PostgresConnector")
    assert(got("plugin.name") == "pgoutput")
    assert(got("publication.name") == "healthcare_pub")
    assert(got("slot.name") == "debezium_slot")
    assert(got("table.include.list") == "public.provider,public.care_site")
    assert(got("topic.prefix") == "cdc")
    assert(got("database.server.name") == "medical_server")
  }

  // ------------------------------------------------------ D6 live REST + retry

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/connectors", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("D6: registerConnector POSTs the payload and returns the body") {
    var seenBody = ""
    var seenType = ""
    withServer { ex =>
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seenType = ex.getRequestHeaders.getFirst("Content-Type")
      respond(ex, 201, """{"name":"postgres-cdc"}""")
    } { url =>
      val body = CdcSetup.registerConnector(url, CdcSetup.connectorPayload(spec))
      assert(body == """{"name":"postgres-cdc"}""")
    }
    assert(seenType == "application/json")
    assert(seenBody.contains(""""connector.class""""))
  }

  test("D6: retries 5xx with exponential backoff, then succeeds") {
    val calls = new AtomicInteger(0)
    val backoffs = scala.collection.mutable.ArrayBuffer[Long]()
    withServer { ex =>
      if (calls.incrementAndGet() < 3) respond(ex, 503, "starting up")
      else respond(ex, 201, "ok")
    } { url =>
      val body = CdcSetup.registerConnector(url, "{}",
        initialBackoffMs = 10, sleep = backoffs += _)
      assert(body == "ok")
    }
    assert(calls.get() == 3)
    assert(backoffs.toSeq == Seq(10L, 20L)) // exponential
  }

  test("D6: 409 already-registered is idempotent success, 4xx fails fast") {
    withServer(ex => respond(ex, 409, "exists")) { url =>
      assert(CdcSetup.registerConnector(url, "{}") == "exists")
    }
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); respond(ex, 400, "bad config") } { url =>
      val e = intercept[IllegalStateException] {
        CdcSetup.registerConnector(url, "{}", sleep = _ => ())
      }
      assert(e.getMessage.contains("400"))
    }
    assert(calls.get() == 1) // no retry on client error
  }

  test("D6: connect-refused retries then surfaces the failure") {
    val backoffs = scala.collection.mutable.ArrayBuffer[Long]()
    val e = intercept[IllegalStateException] {
      // port 1 refuses connections
      CdcSetup.registerConnector("http://127.0.0.1:1", "{}",
        maxAttempts = 3, initialBackoffMs = 5, sleep = backoffs += _)
    }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(backoffs.toSeq == Seq(5L, 10L))
  }
}
