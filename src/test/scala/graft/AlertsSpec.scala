package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.checks.{Alerts, Checks}

/** Alert delivery: edge-triggered fire on pass→fail, suppression while
  * still failing, recovery notification + re-arm, webhook POST delivery
  * (in-JVM HTTP server), and delivery failures never throwing into the
  * pipeline.
  */
class AlertsSpec extends SparkSpec {

  private def fail(rule: String, subject: String) =
    Checks.CheckResult(rule, subject, 1, Checks.Warn, passed = false,
      detail = s"$rule tripped")
  private def pass(rule: String, subject: String) =
    Checks.CheckResult(rule, subject, 0, Checks.Warn, passed = true)

  test("fire once, suppress repeats, notify recovery, re-arm") {
    val sent = scala.collection.mutable.ArrayBuffer[Alerts.Alert]()
    val mgr = new Alerts.AlertManager((a: Alerts.Alert) => sent += a)
    // run 1: trips → one alert
    assert(mgr.process(Seq(fail("volume_anomaly", "orders"))).size == 1)
    // runs 2-3: still failing → suppressed
    assert(mgr.process(Seq(fail("volume_anomaly", "orders"))).isEmpty)
    assert(mgr.process(Seq(fail("volume_anomaly", "orders"))).isEmpty)
    // run 4: recovers → recovery event, re-armed
    val rec = mgr.process(Seq(pass("volume_anomaly", "orders")))
    assert(rec.size == 1 && rec.head.event == "recovered")
    // run 5: trips again → fires again
    val again = mgr.process(Seq(fail("volume_anomaly", "orders")))
    assert(again.size == 1 && again.head.event == "fired")
    // distinct (rule, subject) pairs alert independently
    assert(mgr.process(Seq(fail("volume_anomaly", "lineitem"),
      fail("not_null", "orders"))).size == 2)
    assert(sent.count(_.event == "fired") == 4)
  }

  test("file notifier appends one parseable JSON line per alert") {
    val path = tmpDir("alerts") + "/alerts.jsonl"
    val mgr = new Alerts.AlertManager(new Alerts.FileNotifier(path))
    mgr.process(Seq(fail("volume_anomaly", "orders")))
    mgr.process(Seq(pass("volume_anomaly", "orders")))
    val lines = Files.readAllLines(Paths.get(path)).asScala
    assert(lines.size == 2)
    assert(lines.head.contains("\"event\":\"fired\"") &&
      lines.head.contains("\"rule\":\"volume_anomaly\""))
    assert(lines(1).contains("\"event\":\"recovered\""))
    // control characters in details must stay escaped (one line each)
    val mgr2 = new Alerts.AlertManager(new Alerts.FileNotifier(path))
    mgr2.process(Seq(Checks.CheckResult("r", "s", 1, Checks.Error,
      passed = false, detail = "line1\nline2\t\"quoted\"")))
    val all = Files.readAllLines(Paths.get(path)).asScala
    assert(all.size == 3 && all(2).contains("line1\\nline2"))
  }

  test("webhook notifier POSTs JSON; failures counted, never thrown") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.add(body)
      ex.sendResponseHeaders(200, 2)
      val os = ex.getResponseBody
      os.write("ok".getBytes); os.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val mgr = new Alerts.AlertManager(new Alerts.WebhookNotifier(url))
      val fired = mgr.process(Seq(fail("freshness", "events")))
      assert(fired.size == 1)
      assert(received.size == 1 &&
        received.peek().contains("\"rule\":\"freshness\""))
      assert(mgr.deliveryFailures == 0)
    } finally server.stop(0)

    // down endpoint: alert is dropped and counted, no exception escapes
    val deadUrl = s"http://127.0.0.1:1/hook"
    val mgr2 = new Alerts.AlertManager(
      new Alerts.WebhookNotifier(deadUrl, timeoutMs = 300))
    val fired2 = mgr2.process(Seq(fail("freshness", "events")))
    assert(fired2.isEmpty && mgr2.deliveryFailures == 1)
    // failed delivery must NOT suppress: the next run retries the fire
    val fired3 = mgr2.process(Seq(fail("freshness", "events")))
    assert(fired3.isEmpty && mgr2.deliveryFailures == 2,
      "undelivered alert must be retried, not swallowed")
  }

  test("delivery failure during recovery keeps the check armed") {
    var up = false
    val sent = scala.collection.mutable.ArrayBuffer[Alerts.Alert]()
    val flaky = new Alerts.AlertNotifier {
      override def send(a: Alerts.Alert): Unit = {
        if (!up) sys.error("down")
        sent += a
      }
    }
    val mgr = new Alerts.AlertManager(flaky)
    up = true
    assert(mgr.process(Seq(fail("r", "t"))).size == 1) // fired + suppressed
    up = false
    assert(mgr.process(Seq(pass("r", "t"))).isEmpty) // recovery LOST
    up = true
    // recovery retries on the next passing run, then the check re-arms
    val rec = mgr.process(Seq(pass("r", "t")))
    assert(rec.size == 1 && rec.head.event == "recovered")
    assert(mgr.process(Seq(fail("r", "t"))).size == 1, "re-armed fire")
  }

  test("Pipeline.withAlerts routes check results, suppressed across runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.pipeline.{Pipeline, Stage}
    val sent = scala.collection.mutable.ArrayBuffer[Alerts.Alert]()
    val mgr = new Alerts.AlertManager((a: Alerts.Alert) => sent += a)
    // a Warn-severity check that always fails: the pipeline stays ok
    // (warn does not block publish) but the alert must fire
    val st = Stage(name = "docs",
      build = (s, _) => (1 to 100).map(i => (i.toLong, s"d$i")).toDF("id", "t"),
      checks = Seq(graft.checks.Checks.Expression("half_ids",
        col("id") <= 50, severity = graft.checks.Checks.Warn)))
    val p = new Pipeline(Seq(st)).withAlerts(mgr)
    val r1 = p.run(spark)
    assert(r1.ok, "warn-severity failure must not fail the run")
    assert(sent.size == 1 && sent.head.event == "fired" &&
      sent.head.subject.startsWith("docs:"))
    val r2 = p.run(spark)
    assert(r2.ok && sent.size == 1, "still-failing check must not re-page")
  }

  test("MetricsStore anomaly wired through the alert manager end to end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val store = new graft.checks.MetricsStore(spark, tmpDir("ms-alert"))
    val stable = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    store.record("run1", "orders", stable)
    store.record("run2", "orders", stable)
    val sent = scala.collection.mutable.ArrayBuffer[Alerts.Alert]()
    val mgr = new Alerts.AlertManager((a: Alerts.Alert) => sent += a)
    // healthy: no alert
    mgr.process(store.volumeAnomaly("orders").toSeq)
    assert(sent.isEmpty)
    // volume collapses → anomaly fires exactly once across repeated runs
    store.record("run3", "orders", stable.limit(10))
    mgr.process(store.volumeAnomaly("orders").toSeq)
    mgr.process(store.volumeAnomaly("orders").toSeq)
    assert(sent.size == 1 && sent.head.rule == "volume_anomaly" &&
      sent.head.event == "fired")
  }
}
