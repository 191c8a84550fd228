package graft.fetch

import graft.engine.SeedSpec
import graft.urls.UrlCanon

/**
 * Sitemap ingestion for the deployable fetch path — the standard way a
 * production crawl seeds beyond a hand-written list. The reference seeds
 * every spider from hard-coded start URLs (e.g.
 * /root/reference/crawler/spiders/shugiin_spider.py:12); sitemaps are the
 * S2-static-seed-list generalization a from-scratch engine wants: the
 * host publishes its own frontier.
 *
 * Scope (deliberate):
 *  - `sitemaps.org` XML: `<urlset><url><loc>` leaf documents and
 *    `<sitemapindex><sitemap><loc>` index documents, one recursion level
 *    deep (the spec allows indexes of indexes; real sites use one level —
 *    deeper nesting is truncated by `maxDepth`).
 *  - discovery per RFC 9309 §2.3 + sitemaps.org: `Sitemap:` lines in
 *    robots.txt (NOT group-scoped — they apply regardless of user-agent,
 *    so parsing here scans every line), falling back to the conventional
 *    `/sitemap.xml` when robots lists none.
 *  - everything driver-side and bounded: `maxUrls` caps the returned seed
 *    list, `maxSitemaps` caps sitemap-document fetches — a hostile or
 *    broken index cannot make seeding unbounded. At 100 TB scale the seed
 *    list is input to the frontier, never the frontier itself: millions of
 *    sitemap URLs would instead be written to a parquet seed table and fed
 *    through `Sources.urlListFile` (S8); this helper targets the
 *    tens-of-thousands case where driver-side assembly is fine.
 *  - plain XML only; `.xml.gz` sitemaps would need the fetcher's byte
 *    path (documented gap — the corpus/loopback fetchers are text-only).
 */
object Sitemaps {

  /** One `<url>` block: the page URL and its `<lastmod>` (raw W3C
    * datetime string — parse with [[lastmodMs]]). lastmod is the host's
    * PUSH signal for recrawl: "this page changed at T" straight from the
    * publisher, complementing [[graft.ops.Recrawl]]'s pull-side
    * extrapolation (see `Recrawl.staleByLastmod`). */
  final case class SitemapEntry(url: String, lastmod: Option[String])

  /** Parsed sitemap document: leaf page entries and/or child sitemap
    * URLs. */
  final case class SitemapDoc(entries: Seq[SitemapEntry], sitemaps: Seq[String]) {
    def urls: Seq[String] = entries.map(_.url)
  }

  /** W3C datetime (the sitemaps.org lastmod format) → epoch millis.
    * Accepts the spec's whole ladder — YYYY, YYYY-MM, YYYY-MM-DD, full
    * ISO-8601 with offset — and answers None on anything malformed
    * (seeding stays best-effort; a bad lastmod just loses its freshness
    * signal, never the URL). Date-only forms resolve at UTC midnight. */
  def lastmodMs(s: String): Option[Long] = {
    val t = s.trim
    try {
      val instant = t.length match {
        case 4 => java.time.Year.parse(t).atDay(1)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
        case 7 => java.time.YearMonth.parse(t).atDay(1)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
        case 10 => java.time.LocalDate.parse(t)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
        case _ => java.time.OffsetDateTime.parse(t).toInstant
      }
      Some(instant.toEpochMilli)
      // NonFatal, not just DateTimeParseException: a parseable-but-extreme
      // year (ISO allows ±999999999) overflows toEpochMilli with an
      // ArithmeticException — "malformed loses its signal, never the URL"
      // must hold for hostile input too
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val SitemapLine = "(?i)^sitemap\\s*:\\s*(\\S+)".r

  /** `Sitemap:` URLs listed in a robots.txt body. Cross-group per the
    * protocol: scanned independently of any User-agent group. Trailing
    * `#` comments are stripped first, same as [[Robots.parse]] — a legal
    * "Sitemap: url  # primary" line must not be dropped. */
  def sitemapUrlsInRobots(robotsTxt: String): Seq[String] =
    robotsTxt.linesIterator.flatMap { raw =>
      val noBom = raw.replace("﻿", "")
      val line = (noBom.indexOf('#') match {
        case -1 => noBom
        case h => noBom.substring(0, h)
      }).trim
      SitemapLine.findFirstMatchIn(line).map(_.group(1))
    }.toSeq.distinct

  /** Parse one sitemap XML body. Elements outside `<url>`/`<sitemap>`
    * blocks are ignored; `<loc>` values are XML-unescaped and trimmed.
    * Malformed XML degrades to "whatever well-formed blocks exist" —
    * seeding is best-effort, never an exception. */
  def parse(xml: String): SitemapDoc = {
    val locRe = "(?is)<loc\\b[^>]*>(.*?)</loc>".r
    val lastmodRe = "(?is)<lastmod\\b[^>]*>(.*?)</lastmod>".r
    def blocksIn(body: String, block: String): Seq[SitemapEntry] = {
      val blockRe = s"(?is)<$block\\b[^>]*>(.*?)</$block>".r
      blockRe.findAllMatchIn(body).flatMap { m =>
        locRe.findFirstMatchIn(m.group(1)).map { l =>
          SitemapEntry(unescape(l.group(1).trim),
            lastmodRe.findFirstMatchIn(m.group(1))
              .map(x => unescape(x.group(1).trim)).filter(_.nonEmpty))
        }
      }.filter(_.url.nonEmpty).toSeq
    }
    SitemapDoc(entries = blocksIn(xml, "url"),
      sitemaps = blocksIn(xml, "sitemap").map(_.url))
  }

  private def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    // `&amp;` LAST: decoding it first would re-scan its output and turn a
    // literal "&amp;lt;" into "<" instead of "&lt;" (double-decode)
    else s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  private def fetchBody(fetcher: Fetcher, url: String): Option[String] =
    Robots.rawBody(fetcher, url)

  /** Sitemap URLs a host advertises: robots.txt `Sitemap:` lines, else
    * the conventional `https://host/sitemap.xml`. */
  def discover(fetcher: Fetcher, host: String, scheme: String = "https"): Seq[String] = {
    val listed = fetchBody(fetcher, s"$scheme://$host/robots.txt")
      .map(sitemapUrlsInRobots).getOrElse(Nil)
    if (listed.nonEmpty) listed else Seq(s"$scheme://$host/sitemap.xml")
  }

  /** Resolve `hosts`' sitemaps into a bounded, canonical-deduped seed
    * list. Index documents recurse up to `maxDepth` levels; at most
    * `maxSitemaps` sitemap documents are fetched and at most `maxUrls`
    * seeds returned (first-listed wins — sitemaps.org orders by
    * publisher priority). */
  def seeds(
      fetcher: Fetcher,
      hosts: Seq[String],
      parseFn: String = "follow_links",
      scheme: String = "https",
      maxUrls: Int = 100000,
      maxSitemaps: Int = 256,
      maxDepth: Int = 2): Seq[SeedSpec] =
    entries(fetcher, hosts, scheme, maxUrls, maxSitemaps, maxDepth)
      .map(e => SeedSpec(e.url, parseFn))

  /** Like [[seeds]] but keeps each URL's `lastmod` — the input to
    * `Recrawl.staleByLastmod` (canonical-deduped, first-listed wins for
    * BOTH the URL and its lastmod). */
  def entries(
      fetcher: Fetcher,
      hosts: Seq[String],
      scheme: String = "https",
      maxUrls: Int = 100000,
      maxSitemaps: Int = 256,
      maxDepth: Int = 2): Seq[SitemapEntry] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    // visited keys on the canonical URL: a self-listing index (cycle) or
    // several indexes referencing one shared sitemap would otherwise be
    // re-fetched once per referencing path, burning the maxSitemaps
    // budget on duplicates and displacing real leaf sitemaps
    val visited = scala.collection.mutable.HashSet[String]()
    var fetched = 0
    def walk(sitemapUrl: String, depth: Int): Unit =
      if (fetched < maxSitemaps && out.size < maxUrls &&
          visited.add(UrlCanon.canonicalize(sitemapUrl))) {
        fetched += 1
        fetchBody(fetcher, sitemapUrl).foreach { body =>
          val doc = parse(body)
          doc.entries.iterator
            .takeWhile(_ => out.size < maxUrls)
            .foreach { e =>
              val c = UrlCanon.canonicalize(e.url)
              if (!out.contains(c)) out.put(c, e.lastmod): Unit
            }
          if (depth < maxDepth) doc.sitemaps.foreach(walk(_, depth + 1))
        }
      }
    hosts.distinct.foreach(h => discover(fetcher, h, scheme).foreach(walk(_, 1)))
    out.iterator.map { case (u, lm) => SitemapEntry(u, lm) }.toSeq
  }
}
