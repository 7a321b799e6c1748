package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** CDC enablement utilities (SURVEY.md §2.10 D5/D6): the engine-adjacent
  * setup surface the reference drives from Python — Postgres CDC DDL
  * (`adapters/postgres.py:33-69`) and Debezium connector registration via
  * the Kafka Connect REST API (`setup.py:67-99`).
  *
  * Split the same way a 1000-node deployment would need it:
  *   - PURE generators (`enableCdcDdl`, `publicationDdl`,
  *     `connectorPayload`) — deterministic strings, unit-testable, usable
  *     from any driver (Airflow task, k8s job, this JVM);
  *   - a thin LIVE executor over plain JDBC (`executeDdl`) and a
  *     retrying HTTP POST (`registerConnector`) — the reference's own
  *     `# TODO: implement a retry mechanism with exponential backoff`
  *     (`setup.py:88`), implemented.
  *
  * These run once per deployment on the driver — there is nothing to
  * distribute, so no Spark dependency at all.
  */
object CdcSetup {

  // ---------------------------------------------------------------- D5: DDL

  /** Grant the connector user logical-replication rights
    * (`postgres.py:39-42`). Requires superuser; idempotent by nature
    * (ALTER/GRANT re-apply cleanly). */
  def enableCdcDdl(user: String): Seq[String] = Seq(
    s"ALTER ROLE ${qIdent(user)} WITH REPLICATION",
    s"GRANT pg_read_all_data TO ${qIdent(user)}")

  /** Idempotent publication create (`postgres.py:53-69`): guard on
    * pg_publication so re-running setup never fails. */
  def publicationDdl(table: String, publication: Option[String] = None): String = {
    val pub = publication.getOrElse(s"${table}_publication")
    s"""DO $$$$
       |BEGIN
       |    IF NOT EXISTS (
       |        SELECT 1 FROM pg_publication WHERE pubname = '${qLit(pub)}'
       |    ) THEN
       |        CREATE PUBLICATION ${qIdent(pub)} FOR TABLE ${qIdent(table)};
       |    END IF;
       |END$$$$""".stripMargin
  }

  /** `SHOW wal_level` must return 'logical' for CDC (`postgres.py:47-51`). */
  val isCdcEnabledSql: String = "SHOW wal_level"

  /** Revert to physical replication (`postgres.py:71-75`). */
  def disableCdcDdl: Seq[String] = Seq(
    "ALTER SYSTEM SET wal_level = replica",
    "SELECT pg_reload_conf()")

  /** Run DDL statements over a plain JDBC connection in autocommit (the
    * reference uses AUTOCOMMIT isolation for ALTER SYSTEM,
    * `postgres.py:35-37`). Returns per-statement success; fails fast on
    * the first error so partial setup is visible. */
  def executeDdl(cfg: Connectors.JdbcConfig, statements: Seq[String]): Int = {
    Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      conn.setAutoCommit(true)
      val st = conn.createStatement()
      try { statements.foreach(st.execute); statements.size }
      finally st.close()
    } finally conn.close()
  }

  /** True iff the database reports logical WAL (CDC-capable). */
  def isCdcEnabled(cfg: Connectors.JdbcConfig): Boolean = {
    Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val rs = conn.createStatement().executeQuery(isCdcEnabledSql)
      rs.next() && rs.getString(1) == "logical"
    } finally conn.close()
  }

  // -------------------------------------------- D6: connector registration

  /** Debezium Postgres connector registration payload (`setup.py:69-85`):
    * same config keys, parameterized instead of hard-coded. Pure — the
    * JSON is asserted byte-for-byte in tests. */
  final case class ConnectorSpec(
      name: String,
      databaseHostname: String, databasePort: Int,
      databaseUser: String, databasePassword: String,
      databaseDbname: String, databaseServerName: String,
      tableIncludeList: Seq[String],
      publicationName: String, slotName: String = "debezium_slot",
      topicPrefix: String = "cdc", pluginName: String = "pgoutput")

  def connectorPayload(spec: ConnectorSpec): String = {
    val config = Seq(
      "connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
      "database.hostname" -> spec.databaseHostname,
      "database.port" -> spec.databasePort.toString,
      "database.user" -> spec.databaseUser,
      "database.password" -> spec.databasePassword,
      "database.dbname" -> spec.databaseDbname,
      "database.server.name" -> spec.databaseServerName,
      "plugin.name" -> spec.pluginName,
      "publication.name" -> spec.publicationName,
      "slot.name" -> spec.slotName,
      "table.include.list" -> spec.tableIncludeList.mkString(","),
      "topic.prefix" -> spec.topicPrefix)
    val cfgJson = config.map { case (k, v) => s""""${jEsc(k)}":"${jEsc(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"name":"${jEsc(spec.name)}","config":$cfgJson}"""
  }

  /** POST the connector config to the Kafka Connect REST API
    * (`setup.py:90-95`) with exponential-backoff retry — the mechanism
    * the reference left as a TODO. Retries on connect errors and 5xx
    * (Connect still starting); 2xx returns the body, 409 (already
    * registered) is success for idempotent setup, other 4xx fail fast. */
  def registerConnector(connectUrl: String, payload: String,
                        maxAttempts: Int = 5, initialBackoffMs: Long = 500,
                        sleep: Long => Unit = Thread.sleep): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build()
    val request = HttpRequest.newBuilder(URI.create(s"$connectUrl/connectors"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload)).build()
    var attempt = 0
    var backoff = initialBackoffMs
    var lastErr: String = ""
    while (attempt < maxAttempts) {
      attempt += 1
      val outcome: Either[String, String] =
        try {
          val resp = client.send(request, HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case ok if ok >= 200 && ok < 300 => Right(resp.body())
            case 409 => Right(resp.body()) // already registered: idempotent
            case s if s >= 500 => Left(s"server $s: ${resp.body()}")
            case s => throw new IllegalStateException(
              s"connector registration rejected ($s): ${resp.body()}")
          }
        } catch {
          case e: java.io.IOException => Left(s"connect error: ${e.getMessage}")
        }
      outcome match {
        case Right(body) => return body
        case Left(err) =>
          lastErr = err
          if (attempt < maxAttempts) { sleep(backoff); backoff *= 2 }
      }
    }
    throw new IllegalStateException(
      s"connector registration failed after $maxAttempts attempts: $lastErr")
  }

  // ----------------------------------------------------------------- quoting

  /** Double-quote a SQL identifier, escaping embedded quotes — the
    * reference interpolates raw (`postgres.py:40`), which breaks on any
    * non-simple name; quoting is strictly safer and semantically equal
    * for the lowercase names the reference uses. */
  private def qIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  private def qLit(s: String): String = s.replace("'", "''")

  private def jEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
