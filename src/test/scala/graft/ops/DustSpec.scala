package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DustSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mine(rows: Seq[(String, Long)], minEvidence: Int = 2) =
    Dust.irrelevantParams(rows.toDF("url", "h"), "url", "h", minEvidence)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("session param judged irrelevant, content param judged relevant") {
    val rows = Seq(
      // two path groups on host a; sid never changes content, page does
      ("http://a.ex/x?page=1&sid=s1", 10L),
      ("http://a.ex/x?page=1&sid=s2", 10L),
      ("http://a.ex/x?page=2&sid=s1", 20L),
      ("http://a.ex/x?page=2&sid=s3", 20L),
      ("http://a.ex/y?page=1&sid=s1", 30L),
      ("http://a.ex/y?page=1&sid=s9", 30L))
    val got = mine(rows)
    // sid: 3 evidence groups (x|page=1, x|page=2, y|page=1), all 1-hash
    assert(got(("a.ex", "sid")) == ((3L, 3L, true)))
    // page: evidence groups x|sid=s1 (h 10 vs 20) — inconsistent
    val pg = got(("a.ex", "page"))
    assert(pg._1 >= 1L && pg._2 == 0L && !pg._3)
  }

  test("single-value groups are not evidence; minEvidence gates the verdict") {
    val rows = Seq(
      ("http://b.ex/p?u=1&t=x", 1L),
      ("http://b.ex/p?u=1&t=y", 1L), // one evidence group for t
      ("http://b.ex/q?u=2&t=z", 2L)) // single t value: not evidence
    assert(mine(rows, minEvidence = 2)(("b.ex", "t")) == ((1L, 1L, false)))
    assert(mine(rows, minEvidence = 1)(("b.ex", "t")) == ((1L, 1L, true)))
    // u never shows 2 values in any group → no row at all
    assert(!mine(rows).contains(("b.ex", "u")))
  }

  test("pair-order insensitivity: reordered query strings share a group") {
    val rows = Seq(
      ("http://c.ex/p?a=1&sid=x", 5L),
      ("http://c.ex/p?sid=y&a=1", 5L),
      ("http://c.ex/r?a=2&sid=x", 6L),
      ("http://c.ex/r?sid=q&a=2", 6L))
    assert(mine(rows)(("c.ex", "sid")) == ((2L, 2L, true)))
  }

  test("canonicalizeUrls drops only irrelevant params on the right host") {
    val verdicts = Seq(
      ("a.ex", "sid", 3L, 3L, true),
      ("a.ex", "page", 2L, 0L, false),
      ("b.ex", "page", 2L, 2L, true))
      .toDF("host", "param", "n_groups", "n_consistent", "irrelevant")
    val urls = Seq(
      "http://a.ex/x?page=2&sid=s7",      // sid dropped, page kept
      "http://a.ex/x?sid=s7",             // query empties → no '?'
      "http://b.ex/x?page=2&sid=s7",      // page dropped (b.ex rule), sid kept
      "http://c.ex/x?page=2&sid=s7",      // no rules for host → untouched
      "http://a.ex/x").toDF("url")        // no query → untouched
    val got = Dust.canonicalizeUrls(urls, "url", verdicts)
      .select("url", "canonical_url").as[(String, String)].collect().toMap
    assert(got("http://a.ex/x?page=2&sid=s7") == "http://a.ex/x?page=2")
    assert(got("http://a.ex/x?sid=s7") == "http://a.ex/x")
    assert(got("http://b.ex/x?page=2&sid=s7") == "http://b.ex/x?sid=s7")
    assert(got("http://c.ex/x?page=2&sid=s7") == "http://c.ex/x?page=2&sid=s7")
    assert(got("http://a.ex/x") == "http://a.ex/x")
  }

  test("DustySite: session families are content-identical, variants differ, all deterministic") {
    import graft.fetch.{DustySite, SyntheticSite}
    val site = DustySite(SyntheticSite(nHosts = 2, basePagesPerHost = 3))
    val u = "https://h0.example.jp/p1"
    val (s1, d1) = site.fetch(u + "?sid=abc")
    val (s2, d2) = site.fetch(u + "?sid=zzz")
    val (s3, d3) = site.fetch(u)
    assert(s1 == 200 && s2 == 200 && s3 == 200)
    assert(d1.get.spans == d2.get.spans && d1.get.spans == d3.get.spans)
    val v1 = site.fetch("https://h0.example.jp/p0?v=1")._2.get.spans
    val v2 = site.fetch("https://h0.example.jp/p0?v=2")._2.get.spans
    val v0 = site.fetch("https://h0.example.jp/p0")._2.get.spans
    assert(v1 != v2 && v1 != v0)
    assert(site.fetch(u + "?utm=1")._1 == 404) // unknown param: no page
    assert(DustySite(SyntheticSite(nHosts = 2, basePagesPerHost = 3))
      .fetch(u)._2.get == d3.get)
  }

  test("DustCanonicalizingParser strips only the target host's dropped params at emission") {
    import graft.engine.DustCanonicalizingParser
    import graft.model.{Document, Span}
    val inner = new graft.engine.PageParser {
      def followUps(doc: Document, meta: Map[String, String]) =
        doc.spans.filter(_.kind == "link")
          .map(s => graft.model.FollowUp(s.media_ref, "follow_links"))
    }
    val p = DustCanonicalizingParser(inner,
      Map("a.ex" -> Set("sid", "utm"), "b.ex" -> Set("page")))
    val doc = Document("http://a.ex/dir/base?sid=me", Seq(
      Span("link", "", "/x?page=2&sid=s7", 0),      // relative: resolves to a.ex
      Span("link", "", "y?sid=s7&utm=z#frag", 1),   // query empties, fragment kept
      Span("link", "", "http://b.ex/x?page=2&sid=s7", 2),
      Span("link", "", "http://c.ex/x?sid=s7", 3),  // host without rules
      Span("link", "", "/plain", 4)))               // no query
    val got = p.followUps(doc, Map.empty).map(_.url)
    assert(got == Seq(
      "http://a.ex/x?page=2",
      "http://a.ex/dir/y#frag",
      "http://b.ex/x?sid=s7",
      "http://c.ex/x?sid=s7",
      "/plain"))
  }

  test("the three feedback parsers stack: dust-canonicalize → trap-skip → mirror-skip") {
    import graft.engine._
    import graft.model.{Document, Span}
    val stacked = MirrorSkippingParser(
      TrapSkippingParser(
        DustCanonicalizingParser(FollowAllLinks, Map("a.ex" -> Set("sid"))),
        Map("a.ex" -> Set("/cal/{d}"))),
      Set("m.ex"))
    val doc = Document("https://a.ex/p1", Seq(
      Span("link", "", "/x?sid=9&page=2", 0),  // sid stripped, page kept
      Span("link", "", "/cal/2020", 1),        // trap template dropped
      Span("link", "", "https://m.ex/p0", 2),  // mirror host dropped
      Span("link", "", "/ok", 3)))             // untouched
    assert(stacked.followUps(doc, Map.empty).map(_.url) ==
      Seq("https://a.ex/x?page=2", "/ok"))
  }

  test("e2e frontier feedback: crawl → DUST mining → canonicalized re-crawl fetches each content exactly once") {
    import graft.engine._
    import graft.fetch.{DustySite, SyntheticSite}
    import org.apache.spark.sql.functions.col
    val site = DustySite(SyntheticSite(
      nHosts = 3, basePagesPerHost = 4, branching = 2, hotFactor = 2))
    val seeds = (0 until 3).map(k => SeedSpec(site.inner.pageUrl(k, 0)))
    val e1 = new WaveEngine(spark, site,
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("dust1"),
        hostBuckets = 8, fetchPartitions = 2))
    e1.run(seeds)
    val obs1 = Recrawl.observationsFromFetched(e1.fetchedTable()).cache()
    val nFetched1 = obs1.count()
    val contents1 = obs1.select($"h".as[Long]).distinct().collect().toSet
    // every distinct content reached: 16 base pages + 2 print variants/host
    assert(contents1.size == site.inner.totalPages + 2 * 3)
    // ... at a multiple of the necessary fetches (session-id waste)
    assert(nFetched1 > 2 * contents1.size)

    val dm = Dust.dropMap(Dust.irrelevantParams(obs1, "url", "h"))
    for (k <- 0 until 3) // sid judged irrelevant everywhere; v never dropped
      assert(dm.getOrElse(site.inner.hostName(k), Set.empty) == Set("sid"))

    val e2 = new WaveEngine(spark, site,
      Map[String, PageParser](
        "follow_links" -> DustCanonicalizingParser(FollowAllLinks, dm)),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("dust2"),
        hostBuckets = 8, fetchPartitions = 2))
    e2.run(seeds)
    val obs2 = Recrawl.observationsFromFetched(e2.fetchedTable()).cache()
    // zero waste: one fetch per distinct content, full content coverage
    assert(obs2.count() == contents1.size.toLong)
    assert(obs2.select($"h".as[Long]).distinct().collect().toSet == contents1)
    assert(obs2.filter(col("url").contains("sid=")).count() == 0)
    obs1.unpersist(); obs2.unpersist()
  }
}
