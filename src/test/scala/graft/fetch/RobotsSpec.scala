package graft.fetch

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowAllLinks, PageParser, SeedSpec, WaveEngine}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("parse: wildcard group, comments, empty disallow, blanket disallow") {
    val txt =
      """# politeness first
        |User-agent: *
        |Disallow: /admin/   # trailing comment
        |Disallow: /search
        |Disallow:
        |
        |User-agent: evilbot
        |Disallow: /
        |""".stripMargin
    assert(Robots.parse(txt) == Seq("/admin/", "/search"))
    assert(Robots.parse(txt, agent = "evilbot/1.0") == Seq("/"))
  }

  test("parse: most specific agent group wins; stacked user-agent lines share a group") {
    val txt =
      """User-agent: graft-crawler
        |User-agent: otherbot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /all
        |""".stripMargin
    assert(Robots.parse(txt, agent = "graft-crawler/0.1") == Seq("/private"))
    assert(Robots.parse(txt, agent = "unrelated") == Seq("/all"))
    assert(Robots.parse("", agent = "x").isEmpty)
  }

  test("parse: a specifically-matching allow-all group overrides the * group (RFC 9309)") {
    val txt =
      """User-agent: graft-crawler
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(Robots.parse(txt, agent = "graft-crawler/0.1").isEmpty) // unrestricted
    assert(Robots.parse(txt, agent = "someone-else") == Seq("/"))
  }

  test("parse: wildcard rules truncate conservatively (never fetch a forbidden page)") {
    val txt =
      """User-agent: *
        |Disallow: /private*
        |Disallow: /*.pdf
        |Disallow: /exact$
        |""".stripMargin
    val rules = Map("h" -> Robots.parse(txt))
    // "/private*" ≡ prefix "/private"; "/*.pdf" over-blocks to "/";
    // "/exact$" over-blocks to prefix "/exact" — skipping allowed pages
    // is acceptable, fetching forbidden ones is not
    assert(Robots.parse(txt) == Seq("/private", "/", "/exact"))
    assert(!Robots.allowed(rules, "https://h/private/x"))
    assert(!Robots.allowed(rules, "https://h/a.pdf"))
    assert(!Robots.allowed(rules, "https://h/exact"))
  }

  test("fetchRules: authorities collapsing to one gate key UNION their rules") {
    // two fixture fetchers standing in for two ports of one host — the
    // gate key strips the port, and last-wins would drop the first
    // authority's disallows
    val f = new Fetcher {
      def fetch(url: String): (Int, Option[graft.model.Document]) = {
        val lines =
          if (url.contains(":81/")) Seq("User-agent: *", "Disallow: /a")
          else Seq("User-agent: *", "Disallow: /b")
        (200, Some(graft.model.Document(url,
          lines.zipWithIndex.map { case (l, i) => graft.model.Span("text", l, "", i) })))
      }
    }
    val rules = Robots.fetchRules(f, Seq("site.example.jp:81", "site.example.jp:82"))
    assert(rules == Map("site.example.jp" -> Seq("/a", "/b")))
  }

  test("allowed: prefix gate matches the engine's candidate filter") {
    val rules = Map("h0.example.jp" -> Seq("/admin/"))
    assert(!Robots.allowed(rules, "https://h0.example.jp/admin/x"))
    assert(Robots.allowed(rules, "https://h0.example.jp/public"))
    assert(Robots.allowed(rules, "https://h1.example.jp/admin/x")) // other host
  }

  test("fetchRules over live HTTP feeds the engine's robots gate end-to-end") {
    def html(body: String) = s"<html><head><title>t</title></head><body>$body</body></html>"
    val pages = Map(
      "/robots.txt" -> "User-agent: *\nDisallow: /private\n",
      "/p0" -> html("""<a href="/p1">ok</a> <a href="/private/x">no</a>"""),
      "/p1" -> html("done"),
      "/private/x" -> html("should never be fetched"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        pages.get(ex.getRequestURI.getPath) match {
          case Some(body) =>
            val ct = if (ex.getRequestURI.getPath.endsWith(".txt")) "text/plain" else "text/html"
            val bytes = body.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type", s"$ct; charset=UTF-8")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val authority = s"127.0.0.1:${server.getAddress.getPort}"
      val fetcher = new HttpFetcher()
      val rules = Robots.fetchRules(fetcher, Seq(authority), scheme = "http")
      assert(rules == Map("127.0.0.1" -> Seq("/private"))) // gate key: hostOf strips the port
      val ckpt = SparkTestSession.tmpDir("robotscrawl")
      val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
      val engine = new WaveEngine(spark, fetcher, parsers,
        CrawlConfig(checkpointDir = ckpt, hostBuckets = 2, fetchPartitions = 2,
          robotsEnabled = true, robotsDisallow = rules))
      engine.run(Seq(SeedSpec(s"http://$authority/p0")))
      import spark.implicits._
      val fetched = engine.fetchedTable().select($"canonical").as[String].collect().toSet
      assert(fetched.exists(_.endsWith("/p1")))
      assert(!fetched.exists(_.contains("/private")), fetched) // gate held
    } finally server.stop(0)
  }
}
