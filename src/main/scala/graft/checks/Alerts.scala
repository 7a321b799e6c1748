package graft.checks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Outbound anomaly alerting — the engine-native form of the reference's
  * Elementary→Slack hook (`promptly/app.py:52-58`: post a message when a
  * monitor trips). [[MetricsStore]] DETECTS anomalies; this module
  * DELIVERS them, edge-triggered with suppression so a persistently
  * failing check pages once, not every run.
  *
  * Scale posture: alerting consumes only `CheckResult` rows (driver-side
  * scalars that exist anyway); no data-plane cost at any table size.
  */
object Alerts {

  final case class Alert(rule: String, subject: String, severity: String,
                         detail: String, event: String)

  /** Delivery transport. Implementations must not throw on delivery
    * failure visible to the pipeline — alerting is best-effort by
    * contract ([[AlertManager.process]] surfaces failures as the return
    * value, never as an exception aborting the run). */
  trait AlertNotifier {
    def send(a: Alert): Unit
  }

  private def toJson(a: Alert): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    s"""{"rule":${q(a.rule)},"subject":${q(a.subject)},""" +
      s""""severity":${q(a.severity)},"event":${q(a.event)},""" +
      s""""detail":${q(a.detail)}}"""
  }

  /** Appends one JSON line per alert — the file-drop integration (tail
    * it into any chat/incident tool). */
  final class FileNotifier(path: String) extends AlertNotifier {
    override def send(a: Alert): Unit = {
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.write(p, (toJson(a) + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** POSTs the alert JSON to a webhook URL (the Slack-incoming-webhook
    * shape). Connect/read timeouts are short: a down webhook must not
    * stall the pipeline. */
  final class WebhookNotifier(url: String, timeoutMs: Int = 5000)
      extends AlertNotifier {
    override def send(a: Alert): Unit = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val body = toJson(a).getBytes(StandardCharsets.UTF_8)
        val out = conn.getOutputStream
        try out.write(body) finally out.close()
        val rc = conn.getResponseCode
        if (rc < 200 || rc >= 300)
          throw new java.io.IOException(s"webhook returned $rc")
      } finally conn.disconnect()
    }
  }

  /** Edge-triggered alert routing with suppression:
    *
    *  - a check transitioning pass→fail fires a `"fired"` alert;
    *  - a check that KEEPS failing is suppressed (no repeat pages);
    *  - a check transitioning fail→pass fires a `"recovered"` alert and
    *    re-arms, so the next failure pages again.
    *
    * Delivery failures are caught and returned (`deliveryFailures`),
    * never thrown — an unreachable webhook must not fail the pipeline
    * run it is reporting on. Single-instance state (one manager per
    * scheduler/driver), like any alert deduplicator. */
  final class AlertManager(notifier: AlertNotifier,
                           notifyRecovery: Boolean = true) {
    private val failing = scala.collection.mutable.Set[(String, String)]()
    private var failures = 0L

    def deliveryFailures: Long = failures

    /** Route one run's check results; returns the alerts actually sent.
      * State transitions COMMIT only when their notification delivers:
      * a failed fire leaves the check un-suppressed (retried next run),
      * a failed recovery keeps it armed-as-failing (recovery retried) —
      * delivery failure can delay a page, never swallow one. */
    def process(results: Seq[Checks.CheckResult]): Seq[Alert] = {
      val sent = scala.collection.mutable.ArrayBuffer[Alert]()
      def deliver(a: Alert): Boolean =
        try { notifier.send(a); sent += a; true }
        catch { case _: Throwable => failures += 1; false }
      results.foreach { r =>
        val key = (r.check, r.column)
        val sev = r.severity match {
          case Checks.Error => "error"
          case Checks.Warn => "warn"
        }
        if (!r.passed && !failing.contains(key)) {
          if (deliver(Alert(r.check, r.column, sev, r.detail, "fired")))
            failing += key
        } else if (r.passed && failing.contains(key)) {
          if (!notifyRecovery ||
              deliver(Alert(r.check, r.column, sev, r.detail, "recovered")))
            failing -= key
        }
      }
      sent.toSeq
    }
  }
}
