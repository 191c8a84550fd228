package graft.fetch

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowAllLinks, PageParser, WaveEngine}
import graft.model.{Document, Span}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

class SitemapsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def textDoc(url: String, body: String): (String, Document) =
    url -> Document(url,
      body.linesIterator.zipWithIndex.map { case (l, i) => Span("text", l, "", i) }.toSeq)

  test("sitemapUrlsInRobots: cross-group, case-insensitive, deduped") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |SITEMAP: https://h/s1.xml
        |
        |User-agent: other
        |sitemap:   https://h/s2.xml
        |Sitemap: https://h/s1.xml
        |""".stripMargin
    assert(Robots.parse(txt) == Seq("/private")) // Sitemap lines don't disturb groups
    assert(Sitemaps.sitemapUrlsInRobots(txt) ==
      Seq("https://h/s1.xml", "https://h/s2.xml"))
  }

  test("parse: urlset, sitemapindex, entities, malformed tolerance") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://h/p?a=1&amp;b=2</loc><lastmod>2024-01-01</lastmod></url>
        |  <url><loc> https://h/q </loc></url>
        |  <url><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(urlset) ==
      Sitemaps.SitemapDoc(Seq("https://h/p?a=1&b=2", "https://h/q"), Nil))

    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://h/a.xml</loc></sitemap>
        |  <sitemap><loc>https://h/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(index) ==
      Sitemaps.SitemapDoc(Nil, Seq("https://h/a.xml", "https://h/b.xml")))

    assert(Sitemaps.parse("<urlset><url><loc>https://h/ok</loc></url><url><loc>")
      == Sitemaps.SitemapDoc(Seq("https://h/ok"), Nil)) // truncated tail dropped
  }

  test("seeds: robots discovery -> index -> leaves, bounded and cycle-safe") {
    val pages = Map(
      textDoc("https://s.example.jp/robots.txt",
        "User-agent: *\nSitemap: https://s.example.jp/index.xml"),
      textDoc("https://s.example.jp/index.xml",
        """<sitemapindex>
          |<sitemap><loc>https://s.example.jp/a.xml</loc></sitemap>
          |<sitemap><loc>https://s.example.jp/index.xml</loc></sitemap>
          |</sitemapindex>""".stripMargin), // self-reference: must terminate
      textDoc("https://s.example.jp/a.xml",
        """<urlset>
          |<url><loc>https://s.example.jp/p1</loc></url>
          |<url><loc>https://s.example.jp/p2</loc></url>
          |<url><loc>https://s.example.jp/p1</loc></url>
          |</urlset>""".stripMargin))
    val f = new MapFetcher(pages)
    val got = Sitemaps.seeds(f, Seq("s.example.jp"))
    assert(got.map(_.url) == Seq("https://s.example.jp/p1", "https://s.example.jp/p2"))
    assert(Sitemaps.seeds(f, Seq("s.example.jp"), maxUrls = 1).map(_.url) ==
      Seq("https://s.example.jp/p1")) // cap is exact, first-listed wins
  }

  test("seeds: duplicate sitemap references don't burn the fetch budget") {
    // index lists itself first, then two leaves; with maxSitemaps = 3 a
    // walker without a visited set would spend fetch #2 re-fetching the
    // index and never reach b.xml
    val pages = Map(
      textDoc("https://v.example.jp/robots.txt",
        "User-agent: *\nSitemap: https://v.example.jp/index.xml"),
      textDoc("https://v.example.jp/index.xml",
        """<sitemapindex>
          |<sitemap><loc>https://v.example.jp/index.xml</loc></sitemap>
          |<sitemap><loc>https://v.example.jp/a.xml</loc></sitemap>
          |<sitemap><loc>https://v.example.jp/b.xml</loc></sitemap>
          |</sitemapindex>""".stripMargin),
      textDoc("https://v.example.jp/a.xml",
        "<urlset><url><loc>https://v.example.jp/pa</loc></url></urlset>"),
      textDoc("https://v.example.jp/b.xml",
        "<urlset><url><loc>https://v.example.jp/pb</loc></url></urlset>"))
    val got = Sitemaps.seeds(new MapFetcher(pages), Seq("v.example.jp"), maxSitemaps = 3)
    assert(got.map(_.url) == Seq("https://v.example.jp/pa", "https://v.example.jp/pb"))
  }

  test("seeds: hosts without robots fall back to /sitemap.xml; absent sitemap -> no seeds") {
    val pages = Map(
      textDoc("https://t.example.jp/sitemap.xml",
        "<urlset><url><loc>https://t.example.jp/only</loc></url></urlset>"))
    assert(Sitemaps.seeds(new MapFetcher(pages), Seq("t.example.jp")).map(_.url) ==
      Seq("https://t.example.jp/only"))
    assert(Sitemaps.seeds(new MapFetcher(Map.empty), Seq("u.example.jp")).isEmpty)
  }

  test("sitemap-discovered seeds drive a live-loopback crawl end-to-end") {
    def html(body: String) = s"<html><body>$body</body></html>"
    val port = new java.util.concurrent.atomic.AtomicInteger
    def pages: Map[String, String] = Map(
      "/robots.txt" -> s"User-agent: *\nSitemap: http://127.0.0.1:${port.get}/map.xml\n",
      "/map.xml" ->
        s"""<urlset>
           |<url><loc>http://127.0.0.1:${port.get}/p1</loc></url>
           |<url><loc>http://127.0.0.1:${port.get}/p2</loc></url>
           |</urlset>""".stripMargin,
      "/p1" -> html("""one <a href="/p3">deeper</a>"""),
      "/p2" -> html("two"),
      "/p3" -> html("three"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        pages.get(ex.getRequestURI.getPath) match {
          case Some(body) =>
            val ct = if (ex.getRequestURI.getPath.endsWith(".html")) "text/html" else "text/plain"
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
    port.set(server.getAddress.getPort)
    try {
      val fetcher = new HttpFetcher()
      val seeds = Sitemaps.seeds(fetcher, Seq(s"127.0.0.1:${port.get}"), scheme = "http")
      assert(seeds.map(_.url).map(u => u.substring(u.lastIndexOf('/'))) == Seq("/p1", "/p2"))
      val ckpt = SparkTestSession.tmpDir("sitemapcrawl")
      val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
      val engine = new WaveEngine(spark, fetcher, parsers,
        CrawlConfig(checkpointDir = ckpt, hostBuckets = 2, fetchPartitions = 2))
      engine.run(seeds)
      import spark.implicits._
      val fetched = engine.fetchedTable().select($"canonical").as[String].collect().toSet
        .map((u: String) => u.substring(u.lastIndexOf('/')))
      assert(fetched == Set("/p1", "/p2", "/p3")) // sitemap seeds + link expansion
    } finally server.stop(0)
  }
}
