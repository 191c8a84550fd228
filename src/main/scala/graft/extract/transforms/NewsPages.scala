package graft.extract.transforms

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.extract.ScrapeFns
import graft.model._

import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, OffsetDateTime}

/**
 * News spider family (SURVEY §3.4): mainichi / nikkei / reuters article
 * pages → News + NewsText, with E4 JSON-LD extraction and E5 thumbnail.
 *
 * Reference: /root/reference/crawler/spiders/{mainichi,nikkei,reuters}
 * _spider.py and crawler/utils/scrape.py:29-39. JSON parsing uses Jackson
 * (shipped with Spark) — the reference uses Python's json module.
 *
 * Span conventions (FIXTURES.md §3): the article page carries
 *  - `title` span: the headline (h1),
 *  - `text` spans: body paragraphs,
 *  - `json` span: the <script type="application/ld+json"> payload (E4),
 *  - `link` spans on LIST pages: article links.
 */
object NewsPages {

  @transient private lazy val mapper = new ObjectMapper()

  /** E4 — parse the page's JSON-LD span (scrape.py:29-33). */
  def extractJsonLdOrNone(doc: Document): Option[JsonNode] =
    SpanTables.jsonBody(doc).filter(_.trim.nonEmpty).flatMap { s =>
      try Some(mapper.readTree(s)) catch { case _: Exception => None }
    }

  /** E5 — `ld['image']['url']` (scrape.py:36-39). */
  def extractThumbnailOrNone(ld: JsonNode): Option[String] = {
    val img = ld.get("image")
    if (img == null) None
    else Option(img.get("url")).map(_.asText()).filter(_.nonEmpty)
  }

  /** `strip_join` (politylink.utils): strip each part, join non-empty. */
  def stripJoin(parts: Seq[String], sep: String = ""): String =
    parts.map(_.trim).filter(_.nonEmpty).mkString(sep)

  private def ts(dt: LocalDateTime): java.sql.Timestamp = java.sql.Timestamp.valueOf(dt)

  /** mainichi: '%Y-%m-%dT%H:%M:%S%z' (mainichi_spider.py:58-60). */
  def parseIsoWithOffset(s: String): Option[java.sql.Timestamp] =
    try Some(ts(OffsetDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxx"))
      .toLocalDateTime))
    catch { case _: Exception => None }

  /** reuters: '%Y-%m-%dT%H:%M:%SZ' (reuters_spider.py:69-71). */
  def parseIsoZ(s: String): Option[java.sql.Timestamp] =
    try Some(ts(LocalDateTime.parse(s.stripSuffix("Z"),
      DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))))
    catch { case _: Exception => None }

  /** nikkei: drop the sub-second/timezone suffix after '.', parse naive,
    * add 9 hours (JST) (nikkei_spider.py:66-69). */
  def parseNikkeiTime(s: String): Option[java.sql.Timestamp] =
    try Some(ts(LocalDateTime.parse(s.split("\\.")(0),
      DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")).plusHours(9)))
    catch { case _: Exception => None }

  /** `to_date_str` (politylink.utils): YYYY-MM-DD of the datetime. */
  def toDateStr(t: java.sql.Timestamp): String = t.toLocalDateTime.toLocalDate.toString

  final case class NewsOut(news: Seq[News] = Nil, texts: Seq[DocText] = Nil,
      follow: Seq[FollowUp] = Nil, quarantined: Seq[String] = Nil)

  /** mainichi list page: article links, 'premier' articles skipped
    * (mainichi_spider.py:22-30). */
  def parseMainichiList(doc: Document): NewsOut =
    NewsOut(follow = SpanTables.linkSpans(doc).collect {
      case (_, href) if href.nonEmpty && !href.contains("premier") =>
        FollowUp(href, "mainichi_news")
    })

  /** nikkei / reuters list pages: every article link is followed
    * (nikkei_spider.py:33-38, reuters_spider.py:34-38); the ?bn= / &page=
    * pagination itself is the S6 source (Sources.numberedPageCrawl). */
  def parseNewsList(doc: Document, parseFn: String): NewsOut =
    NewsOut(follow = SpanTables.linkSpans(doc).collect {
      case (_, href) if href.nonEmpty => FollowUp(href, parseFn)
    })

  private def buildNews(url: String, publisher: String): News =
    News(ScrapeFns.newsId(url), url, publisher = Some(publisher))

  /** Shared JSON-LD enrichment: thumbnail + datePublished/dateModified
    * (mainichi_spider.py:44-54, reuters_spider.py:57-64). */
  private def enrich(news: News, text: DocText, doc: Document,
      parse: String => Option[java.sql.Timestamp]): (News, DocText) =
    extractJsonLdOrNone(doc) match {
      case None => (news, text)
      case Some(ld) =>
        val published = Option(ld.get("datePublished")).map(_.asText()).flatMap(parse)
        val modified = Option(ld.get("dateModified")).map(_.asText()).flatMap(parse)
        (news.copy(
          thumbnail = extractThumbnailOrNone(ld),
          published_at = published,
          last_modified_at = modified),
          text.copy(date = published.map(toDateStr)))
    }

  /** mainichi article (mainichi_spider.py:32-56). */
  def parseMainichiNews(doc: Document): NewsOut = {
    SpanTables.titleOf(doc).map(_.trim) match {
      case None => NewsOut(quarantined = Seq(s"${doc.doc_id}#mainichi-no-title"))
      case Some(title) =>
        val body = stripJoin(SpanTables.textSpans(doc))
        val isPaid = SpanTables.textSpans(doc).exists(_.contains("この記事は有料記事です"))
        val news0 = buildNews(doc.doc_id, "毎日新聞")
          .copy(title = Some(title), is_paid = Some(isPaid))
        val text0 = DocText(news0.id, "news", title = Some(title), body = Some(body))
        val (news, text) = enrich(news0, text0, doc, parseIsoWithOffset)
        NewsOut(news = Seq(news), texts = Seq(text))
    }
  }

  /** reuters article (reuters_spider.py:42-66): is_paid always false. */
  def parseReutersNews(doc: Document): NewsOut = {
    SpanTables.titleOf(doc).map(_.trim) match {
      case None => NewsOut(quarantined = Seq(s"${doc.doc_id}#reuters-no-title"))
      case Some(title) =>
        val body = stripJoin(SpanTables.textSpans(doc))
        val news0 = buildNews(doc.doc_id, "ロイター")
          .copy(title = Some(title), is_paid = Some(false))
        val text0 = DocText(news0.id, "news", title = Some(title), body = Some(body))
        val (news, text) = enrich(news0, text0, doc, parseIsoZ)
        NewsOut(news = Seq(news), texts = Seq(text))
    }
  }

  /** nikkei article (nikkei_spider.py:42-60): title parts joined with a
    * space, timestamp from the time element (a `json` span is absent on
    * nikkei pages — the datetime arrives in meta["datetime"]). */
  def parseNikkeiNews(doc: Document, meta: Map[String, String]): NewsOut = {
    val title = stripJoin(SpanTables.titleOf(doc).toSeq, " ")
    if (title.isEmpty) NewsOut(quarantined = Seq(s"${doc.doc_id}#nikkei-no-title"))
    else {
      val body = stripJoin(SpanTables.textSpans(doc))
      val isPaid = SpanTables.textSpans(doc).exists(_.contains("この記事は会員限定です"))
      val published = meta.get("datetime").flatMap(parseNikkeiTime)
      val news = buildNews(doc.doc_id, "日経新聞")
        .copy(title = Some(title), is_paid = Some(isPaid), published_at = published)
      val text = DocText(news.id, "news", title = Some(title), body = Some(body),
        date = published.map(toDateStr))
      NewsOut(news = Seq(news), texts = Seq(text))
    }
  }
}
