package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.HttpBlockFetcher

/** The neardata-style HTTP fetcher against a localhost server: head
  * probe, block fetch, skipped heights (404), transient-error retries,
  * and give-up after maxRetries. No Spark session needed. */
class HttpFetcherSpec extends AnyFunSuite {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def withServer(f: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      f(server, s"http://127.0.0.1:${server.getAddress.getPort}")
    } finally server.stop(0)
  }

  test("head probe, fetch, and 404-as-skipped") {
    withServer { (server, base) =>
      server.createContext("/v0/last_block/final",
        (ex: HttpExchange) => respond(ex, 200,
          """{"block":{"header":{"height": 1234, "hash": "h"}}}"""))
      server.createContext("/v0/block/",
        (ex: HttpExchange) => {
          val h = ex.getRequestURI.getPath.split("/").last
          if (h == "7") respond(ex, 200, """{"block":{"header":{"height":7}}}""")
          else respond(ex, 404, "")
        })
      val f = new HttpBlockFetcher(base, maxRetries = 1, backoffMs = 1L)
      assert(f.headHeight() === 1234L)
      assert(f.fetch(7L).exists(_.contains("\"height\":7")))
      assert(f.fetch(8L).isEmpty)
    }
  }

  test("transient 500s are retried with backoff; persistent failure throws") {
    withServer { (server, base) =>
      val failures = new AtomicInteger(2)
      server.createContext("/v0/block/",
        (ex: HttpExchange) => {
          val h = ex.getRequestURI.getPath.split("/").last
          if (h == "9") {
            if (failures.getAndDecrement() > 0) respond(ex, 500, "boom")
            else respond(ex, 200, """{"block":{"header":{"height":9}}}""")
          } else respond(ex, 500, "always broken")
        })
      val f = new HttpBlockFetcher(base, maxRetries = 3, backoffMs = 1L)
      // two 500s then success
      assert(f.fetch(9L).nonEmpty)
      // persistent 500 exhausts retries and surfaces as IOException
      intercept[java.io.IOException] { f.fetch(10L) }
    }
  }

  test("bearer token reaches the server as an Authorization header") {
    withServer { (server, base) =>
      val seen = new java.util.concurrent.atomic.AtomicReference[String]("unset")
      server.createContext("/v0/block/",
        (ex: HttpExchange) => {
          seen.set(Option(ex.getRequestHeaders.getFirst("Authorization"))
            .getOrElse("absent"))
          respond(ex, 200, """{"block":{"header":{"height":7}}}""")
        })
      // no token configured -> no header at all
      new HttpBlockFetcher(base, maxRetries = 1, backoffMs = 1L).fetch(7L)
      assert(seen.get === "absent")
      // explicit token -> Bearer header on the request
      new HttpBlockFetcher(base, maxRetries = 1, backoffMs = 1L,
        bearerToken = Some("sekrit-123")).fetch(7L)
      assert(seen.get === "Bearer sekrit-123")
      // and the option-map plumbing used by readStream.option("token",...)
      val opts = new java.util.HashMap[String, String]()
      opts.put("fetcher", "http")
      opts.put("url", base)
      opts.put("token", "opt-token")
      graft.stream.BlockFetcher.from(opts).fetch(7L)
      assert(seen.get === "Bearer opt-token")
    }
  }

  test("a 'null' body means no block at that height") {
    withServer { (server, base) =>
      server.createContext("/v0/block/",
        (ex: HttpExchange) => respond(ex, 200, "null"))
      val f = new HttpBlockFetcher(base, maxRetries = 1, backoffMs = 1L)
      assert(f.fetch(1L).isEmpty)
    }
  }
}
