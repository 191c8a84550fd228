package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TV / video spider family (SURVEY §3.5):
 * shugiin_tv (form-POST paginated day listings → per-deli_id minutes
 * pages), sangiin_tv (sequential sid cursor), vrsdd_tv / vrsdd_member
 * (sequential video ids, unofficial source — URL-only, K4-gated).
 *
 * References: /root/reference/crawler/spiders/shugiin_tv_spider.py,
 * sangiin_tv_spider.py, vrsdd_tv_spider.py, vrsdd_member_spider.py.
 */
object TvPages {

  /** A TV minutes page reduced to the reference's emission: the Minutes
    * shell plus the raw topic/speaker scrapes for the DF-plane lookups
    * (topic→bill R6, speaker→member R8). */
  final case class TvMinutes(
      minutes_id: String,
      name: String,
      start_date_time: java.sql.Timestamp,
      topics: Seq[String],
      speakers: Seq[(String, String)], // (name, href) — activity/url building
      page_url: String,
      summary: Option[String] = None)

  // ------------------------------------------------------------------
  // shugiin_tv
  // ------------------------------------------------------------------

  /** E23 — deli_id / h_page extraction from a day-listing page's anchors
    * (shugiin_tv_spider.py:38-50): every link href is scanned for
    * `deli_id=N`; anchors whose text is 次の結果 carry the next POST page in
    * `h_page.value='N'`. */
  def parseShugiinTvListing(doc: Document): (Seq[String], Seq[String]) = {
    val deliIds = scala.collection.mutable.ArrayBuffer[String]()
    val hPages = scala.collection.mutable.ArrayBuffer[String]()
    val deliRe = "deli_id=([0-9]+)".r
    val pageRe = "h_page.value='([0-9]+)'".r
    for ((text, href) <- SpanTables.linkSpans(doc)) {
      deliRe.findFirstMatchIn(href).foreach(m => deliIds += m.group(1))
      if (text == "次の結果")
        pageRe.findFirstMatchIn(href).foreach(m => hPages += m.group(1))
    }
    (deliIds.toSeq, hPages.toSeq)
  }

  def shugiinMinutesUrl(deliId: String): String =
    s"https://www.shugiintv.go.jp/jp/index.php?ex=VL&deli_id=$deliId"

  /** S7 — the 次の結果 re-POST (`FormRequest.from_response` with
    * formdata={'h_page': N}, shugiin_tv_spider.py:59-64) becomes one
    * frontier row per result page: same endpoint + the posted field as a
    * query param (so the dedup key distinguishes pages), with the POST
    * recorded in meta for the fetcher layer. */
  def shugiinTvFollowUps(doc: Document, pageUrl: String): Seq[FollowUp] = {
    val (deliIds, hPages) = parseShugiinTvListing(doc)
    deliIds.map(id => FollowUp(shugiinMinutesUrl(id), "shugiin_tv_minutes")) ++
      hPages.map(p => FollowUp(s"$pageUrl&h_page=$p", "shugiin_tv_listing",
        Map("method" -> "POST", "h_page" -> p)))
  }

  /** E24 — abbreviated committee name → official full name
    * (shugiin_tv_spider.py:127-142; the map is public data from
    * shugiintv.go.jp's own index page). */
  val FullMeetingNames: Map[String, String] = Map(
    "倫理選挙特別委員会" -> "政治倫理の確立及び公職選挙法改正に関する特別委員会",
    "沖縄北方特別委員会" -> "沖縄及び北方問題に関する特別委員会",
    "拉致問題特別委員会" -> "北朝鮮による拉致問題等に関する特別委員会",
    "消費者問題特別委員会" -> "消費者問題に関する特別委員会",
    "科学技術特別委員会" -> "科学技術・イノベーション推進特別委員会",
    "震災復興特別委員会" -> "東日本大震災復興特別委員会",
    "地方創生特別委員会" -> "地方創生に関する特別委員会",
    "内閣・厚生労働連合審査会" -> "内閣委員会厚生労働委員会連合審査会")

  def fullMeetingName(name: String): String = FullMeetingNames.getOrElse(name, name)

  /** R24 — first-section-only table scan (shugiin_tv_spider.py:114-125):
    * rows are content rows when marked with the spacer protocol (the
    * reference tests for `./images/spacer.gif` in the row HTML; the span
    * encoding marks such rows with row-span text "spacer"); any other row
    * is a section boundary — with `firstSectionOnly`, the scan stops at
    * the first boundary after content. Emits each content row's first
    * non-empty cell text. */
  def scrapeTable(tab: SpanTables.Table, rowMarks: Seq[String],
      firstSectionOnly: Boolean = false): Seq[String] = {
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    for ((cells, marks) <- tab.rows.zip(rowMarks)) {
      if (marks != "spacer") {
        if (firstSectionOnly && texts.nonEmpty) return texts.toSeq
      } else {
        cells.iterator.map(_.text.trim).find(_.nonEmpty).foreach(texts += _)
      }
    }
    texts.toSeq
  }

  /** Row marks of every table of the doc, aligned 1:1 with
    * SpanTables.tables (the row spans' text field carries the spacer
    * protocol marker). Mirrors tables()' state machine exactly — in
    * particular a row span with NO following table_cell is dropped there
    * (flushRow keeps non-empty rows only), so its mark must be dropped
    * here too or every later row pairs with the wrong mark. */
  def rowMarks(doc: Document): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var marks: scala.collection.mutable.ArrayBuffer[String] = null
    var rowMark: String = null
    var rowOpen = false
    var rowHasCell = false
    def flushRow(): Unit = {
      if (rowOpen && rowHasCell) marks += rowMark
      rowOpen = false; rowHasCell = false; rowMark = null
    }
    def flushTable(): Unit = {
      flushRow()
      if (marks != null) { out += marks.toSeq; marks = null }
    }
    for (s <- doc.spans.sortBy(_.offset)) s.kind match {
      case "caption" =>
        flushTable(); marks = scala.collection.mutable.ArrayBuffer()
      case "row" =>
        if (marks == null) marks = scala.collection.mutable.ArrayBuffer()
        flushRow(); rowOpen = true; rowMark = s.text
      case "table_cell" =>
        if (marks == null) marks = scala.collection.mutable.ArrayBuffer()
        if (!rowOpen) { rowOpen = true; rowMark = "" } // implicit row, no marker
        rowHasCell = true
      case _ => ()
    }
    flushTable()
    out.toSeq
  }

  /** shugiin_tv minutes page (shugiin_tv_spider.py:79-112):
    * table 0 = the library detail table (term at cell 1, desc at cell 3;
    * 開会日 → E6 datetime, 会議名 → E24 full name), tables 1-3 = the
    * library2 tables (topics = table 1; speakers = table 3, first section
    * only, deduplicated). */
  def parseShugiinTvMinutes(doc: Document): Option[TvMinutes] = {
    val tabs = SpanTables.tables(doc)
    if (tabs.isEmpty) return None
    val marks = rowMarks(doc)
    var dateTime: Option[java.time.LocalDateTime] = None
    var meetingName: Option[String] = None
    for (cells <- tabs.head.rows if cells.length >= 4) {
      val term = cells(1).text
      val desc = cells(3).text.trim.split(ScrapeFns.WsRegex).headOption.getOrElse("")
      if (term == "開会日") dateTime = ScrapeFns.extractDatetime(desc)
      if (term == "会議名") meetingName = Some(fullMeetingName(desc))
    }
    (dateTime, meetingName) match {
      case (Some(dt), Some(mn)) if tabs.length >= 4 =>
        val name = "衆議院" + mn
        val topics = scrapeTable(tabs(1), marks(1))
        val speakers = ScrapeFns.deduplicate(
          scrapeTable(tabs(3), marks(3), firstSectionOnly = true))
        // anchors of the library2 tables → (member name, href)
        val anchors = SpanTables.linkSpans(doc)
        val dtStr = dt.toLocalDate.toString + " 00:00:00"
        Some(TvMinutes(
          minutes_id = ScrapeFns.minutesId(name, dtStr),
          name = name,
          start_date_time = java.sql.Timestamp.valueOf(dt),
          topics = topics,
          speakers = anchors.filter { case (t, _) => speakers.contains(t) },
          page_url = doc.doc_id))
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // sangiin_tv
  // ------------------------------------------------------------------

  /** sangiin_tv detail page (sangiin_tv_spider.py:75-112): a 2-column
    * detail table (開会日 → E6, 会議名 → 、 removed), summary from the text
    * spans (squeezed concat), topics from `list_item` spans, speakers
    * from link spans (deduplicated). */
  def parseSangiinTvMinutes(doc: Document): Option[TvMinutes] = {
    val tabs = SpanTables.tables(doc)
    var dateTime: Option[java.time.LocalDateTime] = None
    var meetingName: Option[String] = None
    for (tab <- tabs.headOption.toSeq; cells <- tab.rows if cells.length >= 2) {
      val term = cells(0).text
      val desc = cells(1).text
      if (term == "開会日") dateTime = ScrapeFns.extractDatetime(desc)
      if (term == "会議名") meetingName = Some(desc.replace("、", ""))
    }
    (dateTime, meetingName) match {
      case (Some(dt), Some(mn)) =>
        val name = "参議院" + mn
        val summary = doc.spans.filter(_.kind == "text").sortBy(_.offset)
          .map(s => ScrapeFns.squeezeWhitespace(s.text)).mkString("")
        val topics = doc.spans.filter(_.kind == "list_item").sortBy(_.offset).map(_.text)
        val links = SpanTables.linkSpans(doc) // once — not per speaker
        val speakers = ScrapeFns.deduplicate(links.map(_._1))
          .flatMap(nm => links.find(_._1 == nm))
        val dtStr = dt.toLocalDate.toString + " 00:00:00"
        Some(TvMinutes(
          minutes_id = ScrapeFns.minutesId(name, dtStr),
          name = name,
          start_date_time = java.sql.Timestamp.valueOf(dt),
          topics = topics,
          speakers = speakers,
          page_url = doc.doc_id,
          summary = Some(summary).filter(_.nonEmpty)))
      case _ => None
    }
  }

  /** R16 — resume cursor from the newest persisted state: the max sid
    * among the latest minutes' SHINGI_TYUKEI urls, minus the failure
    * window (sangiin_tv_spider.py:31-50). A pure aggregate over the urls
    * table — one narrow scan + max, no collect of rows. */
  def lastSidOrNone(spark: SparkSession, urls: DataFrame): Option[Long] = {
    import spark.implicits._
    val sids = urls
      .filter($"title" === "SHINGI_TYUKEI")
      .select(regexp_extract($"url", "sid=(\\d+)", 1).as("sid"))
      .filter($"sid" =!= "")
      .select(max($"sid".cast("long")))
      .as[Option[Long]]
    sids.head()
  }

  /** Same aggregate for vrsdd video ids: max trailing path segment of
    * VRSDD urls (vrsdd_tv_spider.py:29-46). */
  def lastVrsddIdOrNone(spark: SparkSession, urls: DataFrame): Option[Long] = {
    import spark.implicits._
    urls
      .filter($"title" === "VRSDD")
      .select(regexp_extract($"url", "/(\\d+)$", 1).as("vid"))
      .filter($"vid" =!= "")
      .select(max($"vid".cast("long")))
      .as[Option[Long]]
      .head()
  }

  // ------------------------------------------------------------------
  // vrsdd
  // ------------------------------------------------------------------

  /** E22-variant — `第(\d+)回[(衆|参)] NAME YYYY/MM/DD` page title
    * (vrsdd_tv_spider.py:67-76); the meeting name's optional modifier
    * (e.g. [閉]) is dropped by taking the last whitespace token. */
  def parseVrsddTitle(text: String): Option[(String, String, java.time.LocalDateTime)] = {
    val re = "第(\\d+)回\\[(衆|参)\\] (.+) ([0-9/]+)".r
    re.findFirstMatchIn(text).flatMap { m =>
      val house = m.group(2) + "議院"
      val meeting = m.group(3).trim.split(ScrapeFns.WsRegex).last
      val parts = m.group(4).split("/")
      if (parts.length != 3) None
      else try Some((house, meeting,
        java.time.LocalDateTime.of(parts(0).toInt, parts(1).toInt, parts(2).toInt, 0, 0)))
      catch { case _: Exception => None }
    }
  }

  /** vrsdd_tv page → (minutes_id, VRSDD UrlEntity). The reference does
    * NOT merge the Minutes (unofficial source): the link is K4-gated on
    * the minutes' existence by the caller (vrsdd_tv_spider.py:55-63). */
  def parseVrsddTv(doc: Document): Option[(String, UrlEntity)] =
    SpanTables.titleOf(doc).flatMap(parseVrsddTitle).map { case (house, meeting, dt) =>
      val name = house + meeting
      val dtStr = dt.toLocalDate.toString + " 00:00:00"
      val mid = ScrapeFns.minutesId(name, dtStr)
      (mid, UrlEntity(ScrapeFns.urlId(doc.doc_id), doc.doc_id, "VRSDD", "grips.ac.jp", mid))
    }

  /** vrsdd_member page → (member name, VRSDD url); the member lookup is
    * the R8 join on the DF plane (vrsdd_member_spider.py:31-40). */
  def parseVrsddMember(doc: Document): Option[(String, String)] =
    SpanTables.titleOf(doc).map(_.trim).filter(_.nonEmpty).map(name => (name, doc.doc_id))

  /** Activities + SHINGI_TYUKEI urls for a TV minutes page's member
    * speakers (TvSpiderTemplate.build_activities_and_urls,
    * /root/reference/crawler/spiders/__init__.py:221-241): speakers join
    * the member dim exactly by name (broadcast). */
  def activitiesAndUrls(
      spark: SparkSession,
      tv: Dataset[TvMinutes],
      members: Dataset[Member],
      urlTitle: String = "SHINGI_TYUKEI",
      domain: String = "shugiintv.go.jp"): DataFrame = {
    import spark.implicits._
    tv.select($"minutes_id", $"start_date_time", $"page_url",
        explode($"speakers").as("sp"))
      .select($"minutes_id", $"start_date_time", $"page_url",
        $"sp._1".as("speaker"), $"sp._2".as("href"))
      .join(broadcast(members.select($"id".as("member_id"), $"name".as("speaker"))),
        Seq("speaker"))
      .map { r =>
        val memberId = r.getAs[String]("member_id")
        val mid = r.getAs[String]("minutes_id")
        val dt = r.getAs[java.sql.Timestamp]("start_date_time")
        val href = r.getAs[String]("href")
        val activityId = ScrapeFns.activityId(memberId, mid, dt.toString)
        (activityId, memberId, mid, dt, ScrapeFns.urlId(href), href, urlTitle, domain)
      }
      .toDF("activity_id", "member_id", "minutes_id", "datetime",
        "url_id", "url", "url_title", "domain")
  }
}
