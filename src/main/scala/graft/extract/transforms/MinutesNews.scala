package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Minutes-news spider family (SURVEY §3.6):
 *  - sangiin_minutes: per-committee 経過 (keika) pages — h4/pre caption-zip
 *    of (date, summary) — and 質疑項目 (sitsugi) link pages; both resolve
 *    against existing Minutes by (committee name, date) with a match-count
 *    audit (R10).
 *  - shugiin_minutes: committee news indexes → per-meeting pages whose h4
 *    link is the GAIYOU_PDF; the link to Minutes is gated on the minutes'
 *    existence (K4).
 *
 * References: /root/reference/crawler/spiders/sangiin_minutes_spider.py,
 * shugiin_minutes_spider.py.
 */
object MinutesNews {

  // ------------------------------------------------------------------
  // sangiin_minutes
  // ------------------------------------------------------------------

  /** Index page: 経過-containing anchors → keika pages, 質疑項目 anchors →
    * sitsugi pages (sangiin_minutes_spider.py:19-34). */
  def parseSangiinIndex(doc: Document): Seq[FollowUp] =
    SpanTables.linkSpans(doc).collect {
      case (text, href) if text != null && text.contains("経過") =>
        FollowUp(href, "sangiin_keika")
      case (text, href) if text == "質疑項目" =>
        FollowUp(href, "sangiin_sitsugi")
    }

  /** One (committee, date, summary) keika item awaiting its R10 minutes
    * resolution. */
  final case class KeikaItem(
      committee_name: String,
      date: java.sql.Timestamp,
      summary: String,
      url: String,
      url_title: String)

  /** keika page (sangiin_minutes_spider.py:36-61): the h2 caption names
    * the committee (suffix 経過 stripped, 参議院-prefixed); subsequent
    * caption spans are the h4 date headers, each zipped with its pre
    * summary (the next text span) — the R3 caption-zip variant. Items
    * whose summary is a correction notice (誤りにつき訂正) are skipped. */
  def parseKeika(doc: Document): (Seq[KeikaItem], Seq[String]) = {
    val spans = doc.spans.sortBy(_.offset)
    val captions = spans.filter(_.kind == "caption")
    if (captions.isEmpty) return (Nil, Seq(s"${doc.doc_id}#keika-no-h2"))
    val h2 = captions.head.text
    if (!h2.endsWith("経過")) return (Nil, Seq(s"${doc.doc_id}#keika-bad-h2"))
    val committee = "参議院" + h2.dropRight(2)
    val quarantined = scala.collection.mutable.ArrayBuffer[String]()
    val items = scala.collection.mutable.ArrayBuffer[KeikaItem]()
    // pair each h4 caption with the first text span before the next caption
    var i = spans.indexOf(captions.head) + 1
    var curDate: Option[java.sql.Timestamp] = None
    for (s <- spans.drop(i)) s.kind match {
      case "caption" =>
        curDate = ScrapeFns.convertJapaneseDate(s.text).map(java.sql.Timestamp.valueOf)
        if (curDate.isEmpty) quarantined += s"${doc.doc_id}#keika-date:${s.text}"
      case "text" if curDate.isDefined =>
        val summary = ScrapeFns.squeezeWhitespace(s.text)
        if (!summary.contains("誤りにつき訂正") && summary.nonEmpty)
          items += KeikaItem(committee, curDate.get, summary, doc.doc_id, "IINKAI_KEIKA")
        curDate = None
      case _ => ()
    }
    (items.toSeq, quarantined.toSeq)
  }

  /** sitsugi page (sangiin_minutes_spider.py:63-84): the h3 caption's last
    * whitespace token names the committee; each anchor's text is a date,
    * its href the 質疑項目 URL. */
  def parseSitsugi(doc: Document): (Seq[KeikaItem], Seq[String]) = {
    val captions = doc.spans.filter(_.kind == "caption").sortBy(_.offset)
    if (captions.isEmpty) return (Nil, Seq(s"${doc.doc_id}#sitsugi-no-h3"))
    val committee = "参議院" +
      captions.head.text.trim.split(ScrapeFns.WsRegex).last
    val quarantined = scala.collection.mutable.ArrayBuffer[String]()
    val items = scala.collection.mutable.ArrayBuffer[KeikaItem]()
    for ((text, href) <- SpanTables.linkSpans(doc)) {
      ScrapeFns.convertJapaneseDate(text) match {
        case Some(dt) =>
          items += KeikaItem(committee, java.sql.Timestamp.valueOf(dt), "", href, "IINKAI_SITSUGI")
        case None => quarantined += s"${doc.doc_id}#sitsugi-date:$text"
      }
    }
    (items.toSeq, quarantined.toSeq)
  }

  final case class ResolvedItem(
      minutes_id: String,
      committee_name: String,
      date: java.sql.Timestamp,
      summary: String,
      url: String,
      url_title: String)

  /** Match-count audit row: how many Minutes matched one scraped item —
    * the reference warns when it is not exactly 1
    * (sangiin_minutes_spider.py:53-60,78-83). */
  final case class MatchAudit(
      committee_name: String,
      date: java.sql.Timestamp,
      n_matches: Long)

  /** R10 — minutes-by-(name, date) join + count audit. Items join the
    * minutes dim on (name, start date); the broadcast hint applies when
    * the items side is the small per-batch scrape. Returns the resolved
    * links (all matches, as the reference links every match) plus the
    * audit rows for items whose match count differs from 1. */
  def attachToMinutes(
      spark: SparkSession,
      items: Dataset[KeikaItem],
      minutes: Dataset[Minutes]): (Dataset[ResolvedItem], Dataset[MatchAudit]) = {
    import spark.implicits._
    val m = minutes.select($"id".as("minutes_id"), $"name".as("mname"),
      to_date($"start_date_time").as("mdate"))
    // per-ITEM identity for the audit: the reference warns per scraped
    // item (sangiin_minutes_spider.py:78-83); grouping by (name, date)
    // alone would sum the counts of distinct items sharing a key
    val keyed = items.toDF()
      .withColumn("idate", to_date($"date"))
      .withColumn("item_idx", monotonically_increasing_id())
    val joined = keyed.join(m,
        keyed("committee_name") === m("mname") && keyed("idate") === m("mdate"),
        "left_outer")
      .cache()
    val resolved = joined
      .filter($"minutes_id".isNotNull)
      .select($"minutes_id", $"committee_name", $"date", $"summary", $"url", $"url_title")
      .as[ResolvedItem]
    val audit = joined
      .groupBy($"item_idx", $"committee_name", $"date")
      .agg(sum(when($"minutes_id".isNotNull, 1L).otherwise(0L)).as("n_matches"))
      .filter($"n_matches" =!= 1L)
      .select($"committee_name", $"date", $"n_matches")
      .as[MatchAudit]
    (resolved, audit)
  }

  // ------------------------------------------------------------------
  // shugiin_minutes
  // ------------------------------------------------------------------

  /** Committee index: every linked cell of the first two tables names a
    * committee (衆議院-prefixed) whose news page is followed
    * (shugiin_minutes_spider.py:30-40,84-93). */
  def parseShugiinCommitteeIndex(doc: Document): Seq[FollowUp] =
    SpanTables.tables(doc).take(2).flatMap(_.rows).flatten.collect {
      case cell if cell.href.nonEmpty && cell.text.trim.nonEmpty =>
        FollowUp(cell.href, "shugiin_committee_news",
          Map("committee_name" -> ("衆議院" + ScrapeFns.squeezeWhitespace(cell.text))))
    }

  /** Committee news page: every list link is a per-meeting page
    * (shugiin_minutes_spider.py:42-50,95-101); the committee meta rides
    * along. */
  def parseShugiinCommitteeNews(doc: Document, meta: Map[String, String]): Seq[FollowUp] =
    SpanTables.linkSpans(doc).collect {
      case (_, href) if href.nonEmpty => FollowUp(href, "shugiin_minutes_news", meta)
    }

  /** Per-meeting news page (shugiin_minutes_spider.py:52-80): the first
    * link is the GAIYOU_PDF; the page title carries the meeting date
    * (E22, year from the diet's start date). Emits (minutes_id, url) for
    * the K4 existence-gated link — the reference only links when the
    * minutes already exists. */
  def parseShugiinMinutesNews(
      doc: Document,
      meta: Map[String, String],
      dietYear: Int): Option[(String, UrlEntity)] = {
    val committee = meta.getOrElse("committee_name", "")
    for {
      (_, href) <- SpanTables.linkSpans(doc).headOption
      title <- SpanTables.titleOf(doc)
      dt <- ScrapeFns.extractDatetimeFromTitle(title, dietYear)
    } yield {
      val dtStr = dt.toLocalDate.toString + " 00:00:00"
      val mid = ScrapeFns.minutesId(committee, dtStr)
      (mid, UrlEntity(ScrapeFns.urlId(href), href, "GAIYOU_PDF", "shugiin.go.jp", mid))
    }
  }

  /** K4 — keep only urls whose target minutes exists (left-semi against
    * the minutes dim), matching the reference's get-then-link
    * (shugiin_minutes_spider.py:67-72). */
  def gateOnMinutes(
      spark: SparkSession,
      urls: Dataset[UrlEntity],
      minutes: Dataset[Minutes]): Dataset[UrlEntity] = {
    import spark.implicits._
    urls.join(minutes.select($"id".as("to_id")), Seq("to_id"), "left_semi")
      .as[UrlEntity]
  }
}
