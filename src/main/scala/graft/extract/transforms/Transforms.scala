package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

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
 * sangiin bill catalog + 議案情報 (meisai) detail pages (SURVEY §3.2;
 * /root/reference/crawler/spiders/sangiin_spider.py). The reference's
 * largest spider: caption-zip dispatch over the index page (R3 variant,
 * :66-88), 5-cell bill rows (:92-115), then per-bill meisai pages — six
 * 2-column key-value tables (R5, :238-245) with ~15 gated consumers:
 * six lifecycle dates behind 議決∈{可決,修正} gates, 先議区分 → first
 * house, committee/submitter scrapes for the R9/R8 joins (:119-236).
 */
object SangiinBills {

  /** caption → BillCategory — exact match (sangiin_spider.py:67-75;
    * contrast shugiin's contains-match). */
  def categoryOf(caption: String): Option[String] = caption match {
    case "法律案（内閣提出）一覧" => Some("KAKUHOU")
    case "法律案（衆法）一覧" => Some("SHUHOU")
    case "法律案（参法）一覧" => Some("SANHOU")
    case _ => None
  }

  private def catChar(category: String): String = category match {
    case "KAKUHOU" => "閣"
    case "SHUHOU" => "衆"
    case "SANHOU" => "参"
  }

  /** Index page: per caption-matched table, rows of exactly 5 cells
    * (diet, submission, name[+meisai href], _, _) → Bill + GIAN_ZYOUHOU
    * URL + meisai follow-up (sangiin_spider.py:92-115). Rows that fail
    * the arity or int parses are quarantined (the reference logs+skips). */
  def parse(doc: Document): ParseOut = {
    var out = ParseOut()
    for (tab <- SpanTables.tables(doc); cat <- categoryOf(tab.caption);
         (cells, idx) <- tab.rows.zipWithIndex) {
      if (idx == 0) () // header row (R2)
      else if (cells.length != 5) // R1 arity gate (reference asserts == 5)
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
            val meisai = Option(cells(2).href).filter(_.nonEmpty)
            val urls = meisai.map(h =>
              UrlEntity(ScrapeFns.urlId(h), h, "GIAN_ZYOUHOU", "sangiin.go.jp", bill.id)).toSeq
            out = out.copy(
              bills = out.bills :+ bill,
              urls = out.urls ++ urls,
              edges = out.edges ++ urls.map(u => Edge(u.id, bill.id)),
              follow = out.follow ++ meisai.map(h =>
                FollowUp(h, "sangiin_meisai", Map("bill_id" -> bill.id))))
          case _ =>
            out = out.copy(quarantined = out.quarantined :+ s"${doc.doc_id}#${tab.caption}#$idx")
        }
      }
    }
    out
  }

  /** One 2-column meisai table → key-value map (R5;
    * sangiin_spider.py:238-245). Keys squeezed, values kept raw (the
    * consumers strip). */
  def kvOf(tab: SpanTables.Table): Map[String, String] =
    tab.rows.collect { case Seq(k, v, _*) =>
      ScrapeFns.squeezeWhitespace(k.text) -> v.text
    }.toMap

  private def ts(dt: java.time.LocalDateTime): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(dt)

  /** date value under `key`, parsed via E27 era dates, None on miss/garbage
    * (sangiin_spider.py:124-133). */
  private def dateOf(data: Map[String, String], key: String): Option[java.sql.Timestamp] =
    data.get(key).map(_.trim).filter(_.nonEmpty)
      .flatMap(ScrapeFns.convertJapaneseDate).map(ts)

  /** 議決 gate: the date only counts when the decision is 可決 or 修正
    * (sangiin_spider.py:138-160). */
  private def gated(data: Map[String, String], gateKey: String): Option[java.sql.Timestamp] =
    if (data.get(gateKey).exists(v => v.trim == "可決" || v.trim == "修正"))
      dateOf(data, "議決日")
    else None

  /** Meisai page: tables[1..6] = submission, sangiin committee, sangiin
    * plenary, shugiin committee, shugiin plenary, proclamation
    * (sangiin_spider.py:209-215). */
  def parseMeisai(doc: Document, meta: Map[String, String]): Option[BillMeisai] = {
    val billId = meta.getOrElse("bill_id", "")
    val tabs = SpanTables.tables(doc)
    if (tabs.length < 7) return None // arity gate → quarantine upstream
    val submission = kvOf(tabs(1))
    val sangiinCommittee = kvOf(tabs(2))
    val sangiin = kvOf(tabs(3))
    val shugiinCommittee = kvOf(tabs(4))
    val shugiin = kvOf(tabs(5))
    val proclaim = kvOf(tabs(6))

    val firstHouse = submission.get("先議区分").map(_.trim).collect {
      case "衆先議" => "REPRESENTATIVES"
      case "本院先議" => "COUNCILORS"
    }
    val passedCouncilors = gated(sangiin, "議決")
    val passedRepresentatives = gated(shugiin, "議決")
    val proclaimed = dateOf(proclaim, "公布年月日")
    val committees = Seq(
      sangiinCommittee.get("付託委員会等").map(_.trim).filter(_.nonEmpty).map("参議院" + _),
      shugiinCommittee.get("付託委員会等").map(_.trim).filter(_.nonEmpty).map("衆議院" + _)
    ).flatten

    Some(BillMeisai(
      bill_id = billId,
      submitted_date = dateOf(submission, "提出日"),
      passed_councilors_committee_date = gated(sangiinCommittee, "議決・継続結果"),
      passed_councilors_date = passedCouncilors,
      passed_representatives_committee_date = gated(shugiinCommittee, "議決・継続結果"),
      passed_representatives_date = passedRepresentatives,
      proclaimed_date = proclaimed,
      first_house = firstHouse,
      is_passed = proclaimed.isDefined ||
        (passedRepresentatives.isDefined && passedCouncilors.isDefined),
      committee_names = committees,
      submitter_text = submission.get("発議者").map(_.trim).filter(_.nonEmpty)))
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
 * R7 — exact bill lookup join: the ministry-table (billName, urlTitle,
 * href) triples resolve against the bills dim with exact-match name plus
 * optional category / diet-number filters
 * (/root/reference/crawler/spiders/__init__.py:185-200 — `bill_finder
 * .find_one(bill_query, exact_match=True, category=…, diet_number=…)`).
 * The bills dim is broadcast (small); unmatched triples surface on the
 * quarantine channel like the reference's warning log.
 */
object BillUrlJoin {

  def attach(
      spark: SparkSession,
      triples: Dataset[(String, String, String)], // (billName, urlTitle, href)
      bills: Dataset[Bill],
      domain: String,
      category: Option[String] = None,
      dietNumber: Option[Int] = None): (Dataset[UrlEntity], Dataset[Edge], Dataset[String]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim0 = bills.select($"id".as("bill_id"), $"name".as("bill_name"),
      $"category", $"diet_number")
    val dim1 = category.fold(dim0)(c => dim0.filter($"category" === c))
    val dim = dietNumber.fold(dim1)(n => dim1.filter($"diet_number" === n))
    val t = triples.toDF("bill_name", "url_title", "href")
    val joined = t.join(broadcast(dim), Seq("bill_name"), "left_outer").cache()
    val urls = joined.filter($"bill_id".isNotNull).map { r =>
      UrlEntity(ScrapeFns.urlId(r.getAs[String]("href")), r.getAs[String]("href"),
        r.getAs[String]("url_title"), domain, r.getAs[String]("bill_id"))
    }
    val edges = urls.map(u => Edge(u.id, u.to_id))
    val unmatched = joined.filter($"bill_id".isNull)
      .select($"bill_name").as[String]
    (urls, edges, unmatched)
  }
}

/**
 * R17 — diet lookup (/root/reference/crawler/spiders/__init__.py:117-125):
 * exact get by number when given, otherwise the latest diet = max number.
 * The diets dim is tiny (~210 rows ever) so the top-1 is a single-partition
 * sort of a broadcast-sized table — fine at any corpus scale because the
 * table grows ~3 rows/year regardless of crawl volume.
 */
object Diets {
  def getDiet(spark: SparkSession, diets: Dataset[Diet],
      dietNumber: Option[Int] = None): Option[Diet] = {
    import spark.implicits._
    dietNumber match {
      case Some(n) => diets.filter($"number" === n).collect().headOption
      case None => diets.orderBy($"number".desc).limit(1).collect().headOption
    }
  }
}

/**
 * Statically-defined committees that have no crawlable list page
 * (/root/reference/crawler/spiders/manual_committee_spider.py:36-51):
 * the two plenary assemblies plus three shugiin review boards. The
 * reference carries hand-copied descriptions from shugiin.go.jp; here the
 * description records the source page instead of quoting it.
 */
object ManualCommittees {
  private def c(name: String, house: String, num: Option[Int], topic: String): Committee =
    Committee(ScrapeFns.committeeId(name), name, Some(house), num, Seq(topic))

  val committees: Seq[Committee] = Seq(
    c("衆議院本会議", "REPRESENTATIVES", Some(465), "本会議"),
    c("参議院本会議", "COUNCILORS", Some(248), "本会議"),
    c("衆議院憲法審査会", "REPRESENTATIVES", None, "憲法審査"),
    c("衆議院情報監視審査会", "REPRESENTATIVES", None, "特定秘密"),
    c("衆議院政治倫理審査会", "REPRESENTATIVES", None, "政治倫理"))
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
