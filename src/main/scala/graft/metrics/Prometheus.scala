package graft.metrics

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A28: Prometheus text-exposition rendering + Pushgateway sink.
  *
  * Reference: push_metrics(), kafka_to_metrics.py:44-70 — renders
  * `name{k="v",...} value` lines and POSTs them to
  * /metrics/job/<job>/instance/<instance> with a 3 s timeout, swallowing
  * errors (monitoring must never kill the pipeline).
  *
  * Rendering is split in two layers:
  *  - [[lineCol]] — a pure Column expression, so a metric frame can be
  *    rendered distributed (no driver loop) and is oracle-checkable;
  *  - [[render]]/[[push]] — driver-side final assembly inside foreachBatch,
  *    operating on the (top-K-bounded) collected rows.
  */
object Prometheus {

  /** Escape a label value per the exposition format (backslash, quote, \n). */
  def escapeLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def escapeCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("\\\\"), lit("\\\\\\\\")), lit("\""), lit("\\\\\"")), lit("\n"), lit("\\\\n"))

  /** Column expression rendering one exposition line:
    * name{k1="v1",k2="v2"} value. Labels render in the given order (the
    * reference preserves dict insertion order). Null label values render as
    * "NA" (kafka_to_metrics.py:515-517). */
  def lineCol(metric: String, labels: Seq[(String, Column)], value: Column): Column = {
    val labelPart = labels.map { case (k, v) =>
      concat(lit(k + "=\""), escapeCol(coalesce(v.cast("string"), lit("NA"))), lit("\""))
    }.reduceOption((a, b) => concat(a, lit(","), b))
    val braced = labelPart.map(lp => concat(lit(metric + "{"), lp, lit("} ")))
      .getOrElse(lit(metric + " "))
    concat(braced, value.cast("double").cast("string"))
  }

  /** Render a whole frame to exposition lines (adds the line as a column). */
  def renderFrame(df: DataFrame, metric: String, labelCols: Seq[String],
                  valueCol: String): DataFrame =
    df.select(lineCol(metric, labelCols.map(c => c -> col(c)), col(valueCol)).as("line"))

  /** Driver-side render of already-collected metric tuples. */
  def render(metrics: Seq[(String, Seq[(String, String)], Double)]): String =
    metrics.map { case (name, labels, value) =>
      val lp =
        if (labels.isEmpty) ""
        else labels.map { case (k, v) =>
          s"""$k="${escapeLabel(Option(v).getOrElse("NA"))}""""
        }.mkString("{", ",", "}")
      s"$name$lp $value"
    }.mkString("", "\n", "\n")

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(3)).build()

  /** POST exposition text to a Pushgateway; errors are swallowed (3 s
    * timeout), mirroring kafka_to_metrics.py:66-69. Returns true on 2xx. */
  def push(gatewayUrl: String, job: String, instance: String, body: String): Boolean =
    try {
      val uri = URI.create(s"$gatewayUrl/metrics/job/$job/instance/$instance")
      // POST, not PUT: all 14 queries share one Pushgateway group
      // (job/instance), and PUT replaces the whole group — each query's push
      // would erase the other 13 queries' metrics. POST replaces only
      // same-named metrics (matches the reference, kafka_to_metrics.py:66).
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofSeconds(3))
        .header("Content-Type", "text/plain; version=0.0.4")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      val rsp = client.send(req, HttpResponse.BodyHandlers.discarding())
      rsp.statusCode() / 100 == 2
    } catch { case _: Throwable => false }

  /** File sink variant for offline tests: append exposition text. */
  def pushToFile(path: String, body: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, body,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
