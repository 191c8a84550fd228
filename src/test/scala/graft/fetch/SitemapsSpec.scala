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
    assert(Sitemaps.parse(urlset) == Sitemaps.SitemapDoc(
      Seq(Sitemaps.SitemapEntry("https://h/p?a=1&b=2", Some("2024-01-01")),
        Sitemaps.SitemapEntry("https://h/q", None)), Nil))

    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://h/a.xml</loc></sitemap>
        |  <sitemap><loc>https://h/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(index) ==
      Sitemaps.SitemapDoc(Nil, Seq("https://h/a.xml", "https://h/b.xml")))

    assert(Sitemaps.parse("<urlset><url><loc>https://h/ok</loc></url><url><loc>")
      == Sitemaps.SitemapDoc(
        Seq(Sitemaps.SitemapEntry("https://h/ok", None)), Nil)) // truncated tail dropped
  }

  test("lastmodMs: the W3C datetime ladder; malformed -> None") {
    assert(Sitemaps.lastmodMs("2024-01-01") == Some(1704067200000L))
    assert(Sitemaps.lastmodMs("2024") == Some(1704067200000L))
    assert(Sitemaps.lastmodMs("2024-01") == Some(1704067200000L))
    // offset forms agree with the date at the matching instant
    assert(Sitemaps.lastmodMs("2024-01-01T00:00:00Z") == Some(1704067200000L))
    assert(Sitemaps.lastmodMs("2024-01-01T09:00:00+09:00") == Some(1704067200000L))
    assert(Sitemaps.lastmodMs("2024-01-01T00:00:00.500Z") == Some(1704067200500L))
    assert(Sitemaps.lastmodMs("yesterday").isEmpty)
    assert(Sitemaps.lastmodMs("2024-13-01").isEmpty)
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

  test("e2e lastmod freshness: only host-declared-changed + new pages re-crawl") {
    import graft.engine.{NoFollow, SeedSpec}
    import graft.ops.Recrawl
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val h = "f.example.jp"
    def site(mapXml: String) = new MapFetcher(Map(
      textDoc(s"https://$h/robots.txt", s"User-agent: *\nSitemap: https://$h/map.xml"),
      textDoc(s"https://$h/map.xml", mapXml),
      textDoc(s"https://$h/p1", "alpha"),
      textDoc(s"https://$h/p2", "beta"),
      textDoc(s"https://$h/p3", "gamma"),
      textDoc(s"https://$h/p4", "delta")))
    val v1 = site(
      s"""<urlset>
         |<url><loc>https://$h/p1</loc><lastmod>2024-01-01</lastmod></url>
         |<url><loc>https://$h/p2</loc><lastmod>2024-01-02</lastmod></url>
         |<url><loc>https://$h/p3</loc></url>
         |</urlset>""".stripMargin)
    val parsers: Map[String, graft.engine.PageParser] = Map("follow_links" -> NoFollow)
    val e1 = new graft.engine.WaveEngine(spark, v1, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("lm1"),
        hostBuckets = 2, fetchPartitions = 2))
    e1.run(Sitemaps.seeds(v1, Seq(h)))
    val obs = Recrawl.observationsFromFetched(e1.fetchedTable())
      .select(col("url"), col("stored_at_ms")).cache()

    // the host republishes: p1's lastmod bumped past our store time
    // (derived from the OBSERVED store times, not a fixed future date —
    // a hard-coded year would make this test a time bomb), p2 unchanged,
    // p3 still silent, p4 brand new
    val bumped = java.time.Instant.ofEpochMilli(
      obs.agg(org.apache.spark.sql.functions.max($"stored_at_ms"))
        .head.getLong(0) + 1000L).toString
    val v2 = site(
      s"""<urlset>
         |<url><loc>https://$h/p1</loc><lastmod>$bumped</lastmod></url>
         |<url><loc>https://$h/p2</loc><lastmod>2024-01-02</lastmod></url>
         |<url><loc>https://$h/p3</loc></url>
         |<url><loc>https://$h/p4</loc><lastmod>$bumped</lastmod></url>
         |</urlset>""".stripMargin)
    val entries = Sitemaps.entries(v2, Seq(h))
      .map(e => (e.url, e.lastmod.flatMap(Sitemaps.lastmodMs)))
      .toDF("url", "lastmod_ms")
    val stale = Recrawl.staleByLastmod(entries, obs).cache()
    assert(stale.select($"url".as[String], $"reason".as[String]).collect().toMap ==
      Map(s"https://$h/p1" -> "modified", s"https://$h/p4" -> "unseen"))

    // the refresh crawl fetches exactly the stale set
    val e2 = new graft.engine.WaveEngine(spark, v2, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("lm2"),
        hostBuckets = 2, fetchPartitions = 2))
    e2.run(stale.select($"url".as[String]).collect().sorted.toSeq.map(u => SeedSpec(u)))
    assert(e2.fetchedTable().select($"canonical".as[String]).collect().toSet ==
      Set(s"https://$h/p1", s"https://$h/p4"))
    stale.unpersist(); obs.unpersist()
  }
}
