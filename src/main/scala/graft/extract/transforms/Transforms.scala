package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model._

/**
 * Spider-family parse transforms (SURVEY.md §2.1/§2.3/§3), re-expressed as
 * pure functions over span documents, lifted to Datasets by the caller
 * (`docs.flatMap(ShugiinBills.parse)` etc. — row-local, no cross-row
 * state, so they run inside whole-stage pipelines).
 *
 * Span-encoding conventions for page structure (FIXTURES.md §3; fixtures
 * and engine agree on these):
 *  - `title`       page title
 *  - `caption`     starts a table (text = caption / h2 section header)
 *  - `row`         starts a table row (text = "")
 *  - `table_cell`  cell; media_ref = href if the cell wraps a link
 *  - `text`        free text node
 *  - `link`        standalone anchor (text = anchor text, media_ref = href)
 *  - `media`       image (media_ref = src)
 *  - `json`        embedded JSON body
 */
object SpanTables {

  final case class Cell(text: String, href: String)
  final case class Table(caption: String, rows: Seq[Seq[Cell]])

  /** Group spans into caption-delimited tables of row-delimited cells. */
  def tables(doc: Document): Seq[Table] = {
    val out = scala.collection.mutable.ArrayBuffer[Table]()
    var caption: String = null
    var rows: scala.collection.mutable.ArrayBuffer[Seq[Cell]] = null
    var row: scala.collection.mutable.ArrayBuffer[Cell] = null

    def flushRow(): Unit = if (row != null && row.nonEmpty) { rows += row.toSeq; row = null }
    def flushTable(): Unit = {
      flushRow()
      if (rows != null) { out += Table(caption, rows.toSeq); rows = null; caption = null }
    }

    for (s <- doc.spans.sortBy(_.offset)) s.kind match {
      case "caption" =>
        flushTable(); caption = s.text; rows = scala.collection.mutable.ArrayBuffer()
      case "row" =>
        if (rows == null) rows = scala.collection.mutable.ArrayBuffer()
        flushRow(); row = scala.collection.mutable.ArrayBuffer()
      case "table_cell" =>
        if (row == null) row = scala.collection.mutable.ArrayBuffer()
        row += Cell(s.text, s.media_ref)
      case _ => ()
    }
    flushTable()
    out.toSeq
  }

  def titleOf(doc: Document): Option[String] = doc.spans.find(_.kind == "title").map(_.text)
  def textSpans(doc: Document): Seq[String] =
    doc.spans.filter(_.kind == "text").sortBy(_.offset).map(_.text)
  def linkSpans(doc: Document): Seq[(String, String)] =
    doc.spans.filter(_.kind == "link").sortBy(_.offset).map(s => (s.text, s.media_ref))
  def firstMedia(doc: Document): Option[String] =
    doc.spans.filter(_.kind == "media").sortBy(_.offset).headOption.map(_.media_ref)
  def jsonBody(doc: Document): Option[String] = doc.spans.find(_.kind == "json").map(_.text)
}

/** Output bundle of a parse: entities + edges + texts + follow-ups +
  * quarantined rows (K6 side channel). */
final case class ParseOut(
    bills: Seq[Bill] = Nil,
    members: Seq[Member] = Nil,
    committees: Seq[Committee] = Nil,
    urls: Seq[UrlEntity] = Nil,
    edges: Seq[Edge] = Nil,
    texts: Seq[DocText] = Nil,
    follow: Seq[FollowUp] = Nil,
    quarantined: Seq[String] = Nil)

/**
 * shugiin bill catalog (3-level crawl, SURVEY §3.1;
 * /root/reference/crawler/spiders/shugiin_spider.py).
 */
object ShugiinBills {

  /** caption → BillCategory (shugiin_spider.py:134-150). */
  def categoryOf(caption: String): Option[String] =
    if (caption == null) None
    else if (caption.contains("閣法の一覧")) Some("KAKUHOU")
    else if (caption.contains("衆法の一覧")) Some("SHUHOU")
    else if (caption.contains("参法の一覧")) Some("SANHOU")
    else None

  private def catChar(category: String): String = category match {
    case "KAKUHOU" => "閣"
    case "SHUHOU" => "衆"
    case "SANHOU" => "参"
  }

  /** Level-0 index page: first 3 tables only (shugiin_spider.py:126),
    * 6 cells/row: diet, submission, name, _, keika link, honbun link
    * (shugiin_spider.py:152-179). */
  def parse(doc: Document): ParseOut = {
    val tabs = SpanTables.tables(doc).take(3)
    var out = ParseOut()
    for (tab <- tabs; cat <- categoryOf(tab.caption); (cells, idx) <- tab.rows.zipWithIndex) {
      if (idx == 0) () // header row (R2)
      else if (cells.length < 6) // R1 arity gate → quarantine
        out = out.copy(quarantined = out.quarantined :+ s"${doc.doc_id}#${tab.caption}#$idx")
      else {
        val diet = cells(0).text.trim.toIntOption
        val submission = cells(1).text.trim.toIntOption
        val name = ScrapeFns.normalizeWhitespace(cells(2).text)
        (diet, submission) match {
          case (Some(d), Some(sub)) =>
            val billNumber = s"$d-${catChar(cat)}-$sub"
            val bill = Bill(ScrapeFns.billId(billNumber), billNumber, Some(name),
              Some(cat), Some(d), Some(sub))
            val keika = Option(cells(4).href).filter(_.nonEmpty)
            val honbun = Option(cells(5).href).filter(_.nonEmpty)
            val urls = keika.map(h => UrlEntity(ScrapeFns.urlId(h), h, "KEIKA", "shugiin.go.jp", bill.id)).toSeq ++
              honbun.map(h => UrlEntity(ScrapeFns.urlId(h), h, "HONBUN", "shugiin.go.jp", bill.id)).toSeq
            val follow =
              honbun.map(h => FollowUp(h, "shugiin_honbun", Map("bill_id" -> bill.id))).toSeq ++
                keika.map(h => FollowUp(h, "shugiin_keika", Map("bill_id" -> bill.id))).toSeq
            out = out.copy(
              bills = out.bills :+ bill,
              urls = out.urls ++ urls,
              edges = out.edges ++ urls.map(u => Edge(u.id, bill.id)),
              follow = out.follow ++ follow)
          case _ =>
            out = out.copy(quarantined = out.quarantined :+ s"${doc.doc_id}#${tab.caption}#$idx")
        }
      }
    }
    out
  }

  /** Level-1 本文 page: find the 提出時法律案 link → follow
    * (shugiin_spider.py:51-63). */
  def parseHonbun(doc: Document, meta: Map[String, String]): ParseOut = {
    val follow = SpanTables.linkSpans(doc).collectFirst {
      case (text, href) if text.contains("提出時法律案") => FollowUp(href, "shugiin_houan", meta)
    }
    ParseOut(follow = follow.toSeq)
  }

  /** Level-2 法案 page: clean paragraphs (E18), section at 附則/理由 (E17),
    * index BillText + merge bill.reason (shugiin_spider.py:65-91). */
  def parseHouan(doc: Document, meta: Map[String, String]): ParseOut = {
    val billId = meta.getOrElse("bill_id", "")
    val texts = SpanTables.textSpans(doc).map(ScrapeFns.normalizeWhitespace).filter(_.nonEmpty)
    ScrapeFns.buildBillText(texts) match {
      case Some((body, supplement, reason)) =>
        ParseOut(
          bills = Seq(Bill(billId, bill_number = "", reason = Some(reason))),
          texts = Seq(DocText(billId, "bill", body = Some(body),
            supplement = Some(supplement), reason = Some(reason))))
      case None => ParseOut(quarantined = Seq(s"${doc.doc_id}#billtext-order"))
    }
  }

  /** Level-1 経過 page: 2-col key-value table → supported/opposed groups
    * (E8; shugiin_spider.py:93-120). */
  def parseKeika(doc: Document, meta: Map[String, String]): ParseOut = {
    val billId = meta.getOrElse("bill_id", "")
    val kv = SpanTables.tables(doc).flatMap(_.rows).collect {
      case Seq(k, v, _*) => ScrapeFns.squeezeWhitespace(k.text) -> v.text
    }.toMap
    val supported = kv.get("議案提出の賛成者").orElse(kv.get("賛成会派"))
      .map(ScrapeFns.extractParliamentaryGroups(_)).getOrElse(Nil)
    val opposed = kv.get("議案提出の反対者").orElse(kv.get("反対会派"))
      .map(ScrapeFns.extractParliamentaryGroups(_)).getOrElse(Nil)
    if (supported.isEmpty && opposed.isEmpty) ParseOut()
    else ParseOut(bills = Seq(Bill(billId, bill_number = "",
      supported_groups = supported, opposed_groups = opposed)))
  }
}

/**
 * Member list→detail fan-out (SURVEY §3.3;
 * /root/reference/crawler/spiders/shugiin_member_spider.py).
 */
object Members {

  /** List page rows (5 cells: name+君, kana, group, prefecture, n-elected;
    * shugiin_member_spider.py:68-93). */
  def parseList(doc: Document): ParseOut = {
    var out = ParseOut()
    for (tab <- SpanTables.tables(doc); (cells, idx) <- tab.rows.zipWithIndex) {
      if (idx == 0) ()
      else if (cells.length < 5)
        out = out.copy(quarantined = out.quarantined :+ s"${doc.doc_id}#member#$idx")
      else {
        // shugiin name cells end with 君 — drop it, remove inner whitespace (E20)
        val raw = cells(0).text.trim
        val name = ScrapeFns.removeWhitespace(if (raw.endsWith("君")) raw.dropRight(1) else raw)
        val group = ScrapeFns.extractParliamentaryGroupOrNone(cells(2).text.trim)
        val tags = Seq(cells(2).text.trim, cells(3).text.trim).filter(_.nonEmpty)
        val m = Member(ScrapeFns.memberId(name), name, house = Some("REPRESENTATIVES"),
          group = group, tags = tags)
        val href = Option(cells(0).href).filter(_.nonEmpty)
        val urls = href.map(h =>
          UrlEntity(ScrapeFns.urlId(h), h, "GIIN_ZYOUHOU", "shugiin.go.jp", m.id)).toSeq
        out = out.copy(
          members = out.members :+ m,
          urls = out.urls ++ urls,
          edges = out.edges ++ urls.map(u => Edge(u.id, m.id)),
          follow = out.follow ++ href.map(h =>
            FollowUp(h, "member_detail", Map("member_id" -> m.id, "member_name" -> name))))
      }
    }
    out
  }

  /** Detail page: kana names via E11, description via E19, photo
    * (shugiin_member_spider.py:36-66). */
  def parseDetail(doc: Document, meta: Map[String, String]): ParseOut = {
    val memberId = meta.getOrElse("member_id", "")
    val name = meta.getOrElse("member_name", "")
    val nameStr = SpanTables.titleOf(doc).getOrElse("")
    val kana = ScrapeFns.parseNameStr(nameStr)
    val description = SpanTables.textSpans(doc).map(_.trim).filter(_.nonEmpty).mkString(" ")
    val m = Member(memberId, name,
      first_name = kana.map(_._1), last_name = kana.map(_._2),
      first_name_hira = kana.map(_._3), last_name_hira = kana.map(_._4),
      description = Some(description).filter(_.nonEmpty),
      image = SpanTables.firstMedia(doc))
    ParseOut(members = Seq(m),
      texts = Seq(DocText(memberId, "member", body = Some(description))))
  }
}

/**
 * Ministry bill-URL table pages (TableSpiderTemplate,
 * /root/reference/crawler/spiders/__init__.py:150-200; per-spider params
 * e.g. cao_spider.py:9-11). Link-text dispatch (R4): 概要 → GAIYOU_PDF,
 * 新旧 → SINKYU_PDF, else dropped.
 */
object MinistryBillUrls {

  final case class Params(domain: String, tableIdx: Int, billCol: Int, urlCol: Int)

  def urlTitleOf(linkText: String): Option[String] =
    if (linkText.contains("概要")) Some("GAIYOU_PDF")
    else if (linkText.contains("新旧")) Some("SINKYU_PDF")
    else None

  /** Emits (billName, urlTitle, href) triples; the bill lookup join (R7)
    * against the bills dim happens on the Dataset plane. */
  def parse(doc: Document, p: Params): Seq[(String, String, String)] = {
    val tabs = SpanTables.tables(doc)
    if (p.tableIdx >= tabs.length) Nil
    else tabs(p.tableIdx).rows.flatMap { cells =>
      if (cells.length <= math.max(p.billCol, p.urlCol)) Nil // R1 arity gate
      else {
        val billName = ScrapeFns.normalizeWhitespace(cells(p.billCol).text)
        val linkCell = cells(p.urlCol)
        urlTitleOf(linkCell.text).filter(_ => linkCell.href.nonEmpty)
          .map(title => (billName, title, linkCell.href)).toSeq
      }
    }
  }
}

/**
 * Committee list pages (shugiin_committee_spider.py:22-48,
 * sangiin_committee_spider.py:19-65): name, N人 member count, topics list;
 * committee names are house-prefixed (E25).
 */
object Committees {

  def parse(doc: Document, house: String): ParseOut = {
    val prefix = if (house == "REPRESENTATIVES") "衆議院" else "参議院"
    var out = ParseOut()
    for (tab <- SpanTables.tables(doc); cells <- tab.rows) {
      if (cells.length >= 3) {
        val name = prefix + ScrapeFns.squeezeWhitespace(cells(0).text)
        val num = "(\\d+)人".r.findFirstMatchIn(cells(1).text).map(_.group(1).toInt)
        val topics = cells(2).text.split("\n").toSeq
          .map(t => graft.extract.Topics.cleanCommitteeTopic(t)).filter(_.nonEmpty)
        out = out.copy(committees = out.committees :+
          Committee(ScrapeFns.committeeId(name), name, Some(house), num, topics))
      } else if (cells.nonEmpty) {
        out = out.copy(quarantined = out.quarantined :+ s"${doc.doc_id}#committee")
      }
    }
    out
  }
}
