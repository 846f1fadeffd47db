package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Prometheus

/** A28: the Pushgateway HTTP sink against a local in-process server —
  * URL shape, content type, body pass-through, swallowed failures. */
class PrometheusPushSpec extends AnyFunSuite {

  private def withServer(status: Int)(f: (String, () => Option[(String, String, String)]) => Unit): Unit = {
    @volatile var seen: Option[(String, String, String)] = None
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      seen = Some((exchange.getRequestURI.toString,
        Option(exchange.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), body))
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}", () => seen)
    finally server.stop(0)
  }

  test("push PUTs exposition text to /metrics/job/<job>/instance/<instance>") {
    withServer(200) { (url, seen) =>
      val body = Prometheus.render(Seq(("tourism_test_metric", Seq("city" -> "Roma"), 2.0)))
      assert(Prometheus.push(url, "tourism_stream", "local", body))
      val (uri, ctype, got) = seen().get
      assert(uri === "/metrics/job/tourism_stream/instance/local")
      assert(ctype.startsWith("text/plain"))
      assert(got === "tourism_test_metric{city=\"Roma\"} 2.0\n")
    }
  }

  test("non-2xx and unreachable gateways are swallowed (never throw)") {
    withServer(500) { (url, _) =>
      assert(!Prometheus.push(url, "j", "i", "m 1.0\n"))
    }
    assert(!Prometheus.push("http://localhost:1", "j", "i", "m 1.0\n"))
  }
}
