package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.util.{Failure, Success, Try}

/** Report fan-out adapters (SURVEY.md §2.1 S7) — the I/O edge where the
  * formatted report leaves the engine. The reference POSTs the message
  * as JSON to a chat-bot HTTP API and deliberately does NOT fail its
  * pipeline when the send fails — it logs and moves on
  * (/root/reference/src/bot_ventas.py:109-121: `requests.post` +
  * `raise_for_status` inside a swallow-and-log try). The adapters keep
  * that contract: `send` returns a `Try` and throws nothing, so callers
  * decide whether delivery failure is fatal (the reference says no).
  *
  * JDK-only on purpose: `java.net.http.HttpClient` (JDK 11+) keeps the
  * engine dependency-free; a deployment with its own HTTP stack
  * implements the one-method trait instead.
  */
trait ReportTransport {
  def send(text: String): Try[Unit]
}

/** Local delivery — print the report (the engine's default; the CLI's
  * `report` subcommand uses this). */
object StdoutTransport extends ReportTransport {
  def send(text: String): Try[Unit] = Try(println(text))
}

/** POST the report as a JSON object to an HTTP endpoint:
  * `staticFields` + (`textField` -> message), Content-Type
  * application/json, non-2xx mapped to failure (the `raise_for_status`
  * analog). The JSON is built with a minimal escaper because the
  * payload is one flat string map — no JSON library needed or wanted.
  */
final class HttpJsonTransport(endpoint: URI,
    staticFields: Map[String, String] = Map.empty,
    textField: String = "text",
    timeout: Duration = Duration.ofSeconds(10)) extends ReportTransport {

  private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  def send(text: String): Try[Unit] = Try {
    val payload = HttpJsonTransport.toJson(staticFields + (textField -> text))
    val req = HttpRequest.newBuilder(endpoint)
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      sys.error(s"report POST to $endpoint failed: HTTP ${resp.statusCode()}")
  }
}

object HttpJsonTransport {

  /** The reference's exact bot shape (bot_ventas.py:110-115): POST to
    * `<base>/bot<token>/sendMessage` with chat_id + Markdown parse mode.
    * `base` is injectable so tests (and self-hosted bot API servers)
    * point anywhere; the default is the public endpoint the reference
    * uses. */
  def telegram(token: String, chatId: String,
      base: String = "https://api.telegram.org"): HttpJsonTransport =
    new HttpJsonTransport(
      URI.create(s"$base/bot$token/sendMessage"),
      staticFields = Map("chat_id" -> chatId, "parse_mode" -> "Markdown"))

  /** Flat string-map JSON encoder with full string escaping (quotes,
    * backslashes, control chars incl. the newlines every report
    * carries). Deterministic field order = insertion order. */
  private[etl] def toJson(fields: Map[String, String]): String =
    fields.map { case (k, v) => s"${quote(k)}:${quote(v)}" }
      .mkString("{", ",", "}")

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }

  /** Reference-parity delivery wrapper (bot_ventas.py:116-121 +
    * run():129-131): attempt the send, log the outcome, never throw —
    * a report-delivery hiccup must not fail the pipeline that computed
    * it. Returns whether delivery succeeded. */
  def deliverLogged(transport: ReportTransport, text: String): Boolean =
    transport.send(text) match {
      case Success(_) =>
        System.err.println("[report] delivered")
        true
      case Failure(e) =>
        System.err.println(s"[report] delivery failed (report not lost " +
          s"locally): $e")
        false
    }
}
