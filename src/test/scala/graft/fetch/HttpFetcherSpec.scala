package graft.fetch

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowAllLinks, PageParser, SeedSpec, WaveEngine}
import graft.model.SpanKind
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/**
 * The deployability slice: a REAL HTTP server (JDK built-in, loopback
 * only — zero egress) serving HTML pages, fetched by [[HttpFetcher]],
 * parsed by [[HtmlSpans]], crawled end-to-end by the [[WaveEngine]]
 * frontier. This is the path the sandbox previously stubbed with
 * corpus-backed fetchers (VERDICT r3 "What's missing #3").
 */
class HttpFetcherSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html>
       |<html><head><title>$title</title>
       |<script type="application/ld+json">{"@type":"NewsArticle","headline":"$title"}</script>
       |<style>body { color: red; }</style>
       |</head><body>$body</body></html>""".stripMargin

  private def withServer(pages: Map[String, String])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        pages.get(path) match {
          case Some(html) =>
            val bytes = html.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type", "text/html; charset=UTF-8")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HtmlSpans: spans in document order with the reference kinds") {
    val html = page("第204回 法律案",
      """<h2>議事日程</h2>
        |<p>本文の段落です。&amp;テスト</p>
        |<table><caption>案件表</caption>
        |<tr><td>第1号</td><td><a href="/bill/1">犬法案</a> 可決</td></tr></table>
        |<p><a href='/next?page=2'>次へ</a></p>
        |<img src="/thumb.png">残りのテキスト""".stripMargin)
    val spans = HtmlSpans.parse(html)
    val kinds = spans.map(s => (s.kind, s.text, s.media_ref))
    assert(spans.map(_.offset) == spans.indices) // offsets are positions
    assert(kinds.contains((SpanKind.Json, """{"@type":"NewsArticle","headline":"第204回 法律案"}""", "")))
    assert(kinds.contains((SpanKind.Title, "第204回 法律案", "")))
    assert(kinds.contains((SpanKind.Caption, "議事日程", "")))
    assert(kinds.contains((SpanKind.Text, "本文の段落です。&テスト", "")))
    assert(kinds.contains((SpanKind.Caption, "案件表", "")))
    assert(kinds.contains((SpanKind.TableCell, "第1号", "")))
    // anchor inside a cell: link span emitted AND its text joins the cell
    assert(kinds.contains((SpanKind.Link, "犬法案", "/bill/1")))
    assert(kinds.contains((SpanKind.TableCell, "犬法案 可決", "")))
    assert(kinds.contains((SpanKind.Link, "次へ", "/next?page=2")))
    assert(kinds.contains((SpanKind.Media, "", "/thumb.png")))
    assert(kinds.contains((SpanKind.Text, "残りのテキスト", "")))
    // style/script noise never becomes a span
    assert(!spans.exists(_.text.contains("color")))
    // document order: title before caption before cells before trailing text
    val order = Seq(SpanKind.Title, SpanKind.Caption, SpanKind.TableCell, SpanKind.Media)
    val pos = order.map(k => spans.indexWhere(_.kind == k))
    assert(pos == pos.sorted && pos.forall(_ >= 0), spans.mkString("\n"))
  }

  test("HtmlSpans regressions: inline img order, href-less anchors, unclosed cells, attr tokenizing") {
    // inline <img> must not reorder or fuse the surrounding text nodes
    val img = HtmlSpans.parse("""<p>犬<img src="/i.png">猫</p>""")
    assert(img.map(s => (s.kind, s.text, s.media_ref)) == Seq(
      (SpanKind.Text, "犬", ""), (SpanKind.Media, "", "/i.png"), (SpanKind.Text, "猫", "")))
    // <a> without href is transparent — never a link span, text flows on
    val anchor = HtmlSpans.parse("""<p><a name="top">先頭</a>の続き</p>""")
    assert(!anchor.exists(_.kind == SpanKind.Link))
    assert(anchor.exists(s => s.kind == SpanKind.Text && s.text.contains("先頭")))
    // unclosed <a> inside an unclosed <td>: the anchor text reaches BOTH
    // its link span and the enclosing cell's string(.) before the next
    // cell opens
    val cells = HtmlSpans.parse("""<tr><td>第1号 <a href="/b">犬法案<td>可決""")
    val kinds = cells.map(s => (s.kind, s.text, s.media_ref))
    assert(kinds.contains((SpanKind.Link, "犬法案", "/b")))
    assert(kinds.contains((SpanKind.TableCell, "第1号 犬法案", "")))
    assert(kinds.contains((SpanKind.TableCell, "可決", "")))
    // attribute TOKENIZING: a name inside another attribute's quoted
    // value must not win
    val tricky = HtmlSpans.parse("""<a title="link href=/wrong" href="/right">次</a>""")
    assert(tricky.map(s => (s.kind, s.media_ref)).contains((SpanKind.Link, "/right")))
    assert(!tricky.exists(_.media_ref == "/wrong"))
  }

  test("HtmlSpans: malformed entities stay literal; U+3000 runs collapse like the E18 plane") {
    // "&#;" and out-of-range charrefs must never crash the parse (the
    // fetcher's catch-all would mislabel the page a 599 transport failure)
    val s1 = HtmlSpans.parse("<p>a&#;b &#99999999; c</p>")
    assert(s1.exists(_.kind == SpanKind.Text), s1)
    // ideographic space: same normalizer as ScrapeFns.normalizeWhitespace
    val s2 = HtmlSpans.parse("<p>犬　　猫</p>")
    assert(s2.map(_.text) == Seq("犬 猫"), s2)
  }

  test("HttpFetcher resolves a redirected page's links against the FINAL uri (response.url semantics)") {
    val server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getRequestURI.getPath match {
          case "/a" =>
            ex.getResponseHeaders.set("Location", "/sub/")
            ex.sendResponseHeaders(301, -1)
          case "/sub/" =>
            val b = page("sub", """<a href="x.html">エックス</a>""").getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type", "text/html; charset=\"UTF-8\"") // quoted form
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          case "/sub/x.html" =>
            val b = page("x", "終端").getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          case _ => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = new HttpFetcher()
      val (st, doc) = f.fetch(s"$base/a")
      assert(st == 200)
      assert(doc.get.doc_id.endsWith("/sub/"), doc.get.doc_id) // final uri, canonical
      assert(doc.get.spans.exists(s => s.kind == SpanKind.Title && s.text == "sub")) // quoted charset decoded
      // the engine resolves the relative href against the REDIRECTED base
      val ckpt = SparkTestSession.tmpDir("redircrawl")
      val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
      val engine = new WaveEngine(spark, f, parsers,
        CrawlConfig(checkpointDir = ckpt, hostBuckets = 2, fetchPartitions = 2))
      engine.run(Seq(SeedSpec(s"$base/a")))
      import spark.implicits._
      val rows = engine.fetchedTable().select($"canonical", $"status").as[(String, Int)].collect().toMap
      assert(rows(UrlCanon.canonicalize(s"$base/sub/x.html")) == 200, rows) // NOT /x.html
      assert(!rows.keys.exists(_.endsWith(s":${server.getAddress.getPort}/x.html")), rows)
    } finally server.stop(0)
  }

  test("HttpFetcher: live fetch over loopback — status, charset, spans; 404 and dead port as data") {
    withServer(Map("/p0" -> page("トップ", """<a href="/p1">一</a>"""))) { base =>
      val f = new HttpFetcher()
      val (st, doc) = f.fetch(s"$base/p0")
      assert(st == 200)
      assert(doc.get.spans.exists(s => s.kind == SpanKind.Link && s.media_ref == "/p1"))
      assert(doc.get.spans.exists(s => s.kind == SpanKind.Title && s.text == "トップ"))
      val (st404, none) = f.fetch(s"$base/missing")
      assert(st404 == 404 && none.isEmpty)
    }
    // transport failure: a status row, never an exception
    val (stDead, noneDead) = new HttpFetcher(timeoutMs = 1500).fetch("http://127.0.0.1:1/x")
    assert(stDead == 599 && noneDead.isEmpty)
  }

  test("WaveEngine crawls a live HTTP site end-to-end (frontier via real hrefs)") {
    // a small linked site: p0 -> p1,p2; p1 -> p2,p0(dup); p2 -> terminal;
    // plus a dead link (404 as data)
    val pages = Map(
      "/p0" -> page("p0", """<a href="/p1">1</a> <a href="/p2">2</a>"""),
      "/p1" -> page("p1", """<a href="/p2">2</a> <a href="/p0">back</a>"""),
      "/p2" -> page("p2", """<p>終端</p> <a href="/gone">dead</a>"""))
    withServer(pages) { base =>
      val ckpt = SparkTestSession.tmpDir("httpcrawl")
      val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
      val engine = new WaveEngine(spark, new HttpFetcher(), parsers,
        CrawlConfig(checkpointDir = ckpt, hostBuckets = 2, fetchPartitions = 2))
      val res = engine.run(Seq(SeedSpec(s"$base/p0")))
      import spark.implicits._
      val rows = engine.fetchedTable()
        .select($"canonical", $"status").as[(String, Int)].collect().toMap
      assert(rows.size == 4) // p0 p1 p2 + the dead link
      assert(rows(UrlCanon.canonicalize(s"$base/p0")) == 200)
      assert(rows(UrlCanon.canonicalize(s"$base/gone")) == 404)
      assert(res.fetched == 4)
      assert(res.deduped >= 1) // the back-link to p0 was deduped, not refetched
      // extraction plane works on live-parsed spans: every 200 page has a title
      val titled = engine.fetchedTable().filter($"status" === 200)
        .select($"canonical", $"spans").as[(String, Seq[graft.model.Span])].collect()
      assert(titled.forall(_._2.exists(_.kind == SpanKind.Title)))
    }
  }

  test("fetchMedia refuses a body over maxBodyBytes; text fetch keeps the bounded prefix") {
    // the CAS store is first-write-wins on content hash — a silently
    // truncated blob could never be repaired, so an over-cap media body
    // must be a fetch FAILURE (598), while an exactly-cap body is fine
    val big = Array.tabulate[Byte](2048)(i => (i & 0x7F).toByte)
    val exact = Array.tabulate[Byte](1024)(i => (i & 0x7F).toByte)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val bytes = if (ex.getRequestURI.getPath == "/big.bin") big else exact
        ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = new HttpFetcher(maxBodyBytes = 1024)
      val (stBig, blobBig) = f.fetchMedia(s"$base/big.bin")
      assert(stBig == 598 && blobBig.isEmpty)
      val (stExact, blobExact) = f.fetchMedia(s"$base/exact.bin")
      assert(stExact == 200 && blobExact.get.bytes.length == 1024)
      // text surfaces keep the truncated prefix — a partial HTML parse is
      // useful, unlike a partial blob
      val (stText, body) = f.fetchText(s"$base/big.bin")
      assert(stText == 200 && body.get.length == 1024)
    } finally server.stop(0)
  }

  test("media plane over live HTTP: img refs fetched as binary into the CAS store") {
    // two pages share one logo (CAS collapse) and p1 adds a distinct image
    val logo = Array.tabulate[Byte](300)(i => ((i * 31 + 7) & 0xFF).toByte)
    val hero = Array.tabulate[Byte](200)(i => ((i * 17 + 3) & 0xFF).toByte)
    val pages = Map(
      "/p0" -> page("p0", """<a href="/p1">next</a> <img src="/logo.png">"""),
      "/p1" -> page("p1", """<img src="/logo.png"> <img src="/hero.png">"""))
    val bins = Map("/logo.png" -> logo, "/hero.png" -> hero)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        (pages.get(path), bins.get(path)) match {
          case (Some(html), _) =>
            val bytes = html.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type", "text/html; charset=UTF-8")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case (_, Some(bytes)) =>
            ex.getResponseHeaders.set("Content-Type", "image/png")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case _ => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val ckpt = SparkTestSession.tmpDir("httpmedia")
      val mediaRoot = SparkTestSession.tmpDir("httpmedia-store")
      val parsers: Map[String, PageParser] =
        Map("follow_links" -> graft.engine.FollowLinksAndMedia)
      val engine = new WaveEngine(spark, new HttpFetcher(), parsers,
        CrawlConfig(checkpointDir = ckpt, hostBuckets = 2, fetchPartitions = 2,
          mediaStoreDir = Some(mediaRoot)))
      engine.run(Seq(SeedSpec(s"$base/p0")))
      // the shared logo was fetched once (frontier dedup) and stored once
      val refs = graft.sinks.MediaStore.refs(spark, mediaRoot).collect()
      assert(refs.map(_.getAs[String]("canonical")).toSet ==
        Set(UrlCanon.canonicalize(s"$base/logo.png"), UrlCanon.canonicalize(s"$base/hero.png")))
      assert(refs.forall(_.getAs[String]("media_type") == "image/png"))
      val blobs = graft.sinks.MediaStore.blobs(spark, mediaRoot).collect()
      assert(blobs.length == 2)
      val byWitness = blobs.map(b =>
        b.getAs[String]("witness_canonical") -> b.getAs[Array[Byte]]("media_bytes")).toMap
      assert(byWitness(UrlCanon.canonicalize(s"$base/logo.png")).toSeq == logo.toSeq)
      assert(byWitness(UrlCanon.canonicalize(s"$base/hero.png")).toSeq == hero.toSeq)
    } finally server.stop(0)
  }

  private def UrlCanon = graft.urls.UrlCanon
}
