package graft

import java.net.InetSocketAddress
import java.net.http.HttpTimeoutException
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{HttpTransport, Ingest}

/** Live-transport semantics of the S1 REST source against a real local
  * HTTP server: pagination + stop-on-empty, timeout, non-2xx, and
  * malformed-payload rejection (`extract_crypto_data.py:79-107`).
  */
class HttpTransportSpec extends AnyFunSuite {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Serve `handler` on an ephemeral port; hand the base URL to `f`. */
  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/coins", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/coins")
    finally server.stop(0)
  }

  private def pageOf(ex: HttpExchange): Int =
    ex.getRequestURI.getQuery.split("&")
      .collectFirst { case q if q.startsWith("page=") => q.drop(5).toInt }.get

  test("paginates sequentially and stops at the first empty page") {
    val served = new AtomicInteger(0)
    withServer { ex =>
      served.incrementAndGet()
      pageOf(ex) match {
        case 1 => respond(ex, 200,
          """[{"id":"bitcoin","symbol":"btc","name":"Bitcoin","current_price":50000.5,
            |  "market_cap":900, "total_volume":10, "last_updated":"2024-01-01T00:00:00Z"},
            | {"id":"ethereum","symbol":"eth","name":"Ethereum","current_price":3000.25,
            |  "market_cap":400, "total_volume":20, "last_updated":"2024-01-01T00:00:00Z"}]""".stripMargin)
        case 2 => respond(ex, 200,
          """[{"id":"dogecoin","symbol":"dog","name":"Dogecoin","current_price":0.1,
            |  "market_cap":7, "total_volume":1, "last_updated":"2024-01-01T00:00:00Z"}]""".stripMargin)
        case _ => respond(ex, 200, "[]")
      }
    } { url =>
      val fetch = HttpTransport.paged(url, params = Map("per_page" -> "250"))
      val df = Ingest.fetchPaged(TestSession.spark, fetch, maxPages = 10)
      val got = df.select("id", "current_price").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === Map("bitcoin" -> 50000.5, "ethereum" -> 3000.25, "dogecoin" -> 0.1))
      // empty page 3 stopped the loop: pages 1, 2, 3 requested, never 4+
      assert(served.get() === 3)
    }
  }

  test("rejects a non-array JSON payload") {
    withServer(ex => respond(ex, 200, """{"error":"rate limited"}""")) { url =>
      val e = intercept[IllegalArgumentException] {
        HttpTransport.paged(url)(1)
      }
      assert(e.getMessage.contains("expected a JSON array"))
    }
  }

  test("rejects an array whose elements are not objects") {
    withServer(ex => respond(ex, 200, """[1, 2, 3]""")) { url =>
      val e = intercept[IllegalArgumentException] {
        HttpTransport.paged(url)(1)
      }
      assert(e.getMessage.contains("array of objects"))
    }
  }

  test("raises on a non-2xx status") {
    withServer(ex => respond(ex, 503, "overloaded")) { url =>
      val e = intercept[IllegalArgumentException] {
        HttpTransport.paged(url)(1)
      }
      assert(e.getMessage.contains("HTTP 503"))
    }
  }

  test("times out when the server hangs past the request timeout") {
    withServer { ex =>
      Thread.sleep(2000)
      respond(ex, 200, "[]")
    } { url =>
      intercept[HttpTimeoutException] {
        HttpTransport.paged(url, timeout = Duration.ofMillis(300))(1)
      }
    }
  }
}
