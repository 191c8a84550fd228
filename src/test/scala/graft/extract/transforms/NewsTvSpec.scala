package graft.extract.transforms

import graft.SparkTestSession
import graft.extract.ScrapeFns
import graft.fetch.MapFetcher
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class NewsTvSpec extends AnyFunSuite {
  import Fixtures.doc

  // ------------------------------------------------------------------
  // news family
  // ------------------------------------------------------------------

  private val ldJson =
    """{"@type":"NewsArticle","image":{"url":"https://cdn.example.jp/thumb.jpg"},
      |"datePublished":"2021-04-01T10:30:00+0900",
      |"dateModified":"2021-04-02T08:00:00+0900"}""".stripMargin

  private val mainichiArticle = doc("https://mainichi.jp/articles/20210401/k00/1",
    ("title", " 犬法改正案が衆院通過 ", ""),
    ("json", ldJson, ""),
    ("text", " 犬法改正案は1日、衆院本会議で可決された。 ", ""),
    ("text", "", ""),
    ("text", "この記事は有料記事です。", ""))

  test("E4/E5: JSON-LD parse + thumbnail + datetimes (mainichi)") {
    val out = NewsPages.parseMainichiNews(mainichiArticle)
    val n = out.news.head
    assert(n.title.contains("犬法改正案が衆院通過"))
    assert(n.publisher.contains("毎日新聞"))
    assert(n.thumbnail.contains("https://cdn.example.jp/thumb.jpg"))
    assert(n.published_at.contains(java.sql.Timestamp.valueOf("2021-04-01 10:30:00")))
    assert(n.last_modified_at.contains(java.sql.Timestamp.valueOf("2021-04-02 08:00:00")))
    assert(n.is_paid.contains(true))
    val t = out.texts.head
    assert(t.date.contains("2021-04-01"))
    assert(t.body.exists(_.startsWith("犬法改正案は1日")))
  }

  test("E5 string helper matches the typed path and handles garbage") {
    assert(ScrapeFns.extractThumbnailOrNone(ldJson)
      .contains("https://cdn.example.jp/thumb.jpg"))
    assert(ScrapeFns.extractThumbnailOrNone("""{"image":{}}""").isEmpty)
    assert(ScrapeFns.extractThumbnailOrNone("""{}""").isEmpty)
    assert(ScrapeFns.extractThumbnailOrNone("not json").isEmpty)
  }

  test("mainichi list: premier articles skipped") {
    val list = doc("https://mainichi.jp/seiji/",
      ("link", "a", "https://mainichi.jp/articles/1"),
      ("link", "b", "https://mainichi.jp/premier/2"),
      ("link", "c", "https://mainichi.jp/articles/3"))
    val out = NewsPages.parseMainichiList(list)
    assert(out.follow.map(_.url) ==
      Seq("https://mainichi.jp/articles/1", "https://mainichi.jp/articles/3"))
  }

  test("reuters: Z-datetimes, never paid") {
    val article = doc("https://jp.reuters.com/article/x1",
      ("title", "参院で可決", ""),
      ("json", """{"image":{"url":"https://r.example/t.png"},
        |"datePublished":"2021-04-01T01:30:00Z","dateModified":"2021-04-01T02:00:00Z"}""".stripMargin, ""),
      ("text", "本文。", ""))
    val out = NewsPages.parseReutersNews(article)
    val n = out.news.head
    assert(n.is_paid.contains(false))
    assert(n.published_at.contains(java.sql.Timestamp.valueOf("2021-04-01 01:30:00")))
    assert(n.thumbnail.contains("https://r.example/t.png"))
  }

  test("nikkei: time element with sub-second suffix, +9h JST shift, paid marker") {
    val article = doc("https://www.nikkei.com/article/x1",
      ("title", "法案 可決", ""),
      ("text", "本文。", ""),
      ("text", "この記事は会員限定です", ""))
    val out = NewsPages.parseNikkeiNews(article, Map("datetime" -> "2021-04-01T01:30:00.000+09:00"))
    val n = out.news.head
    assert(n.is_paid.contains(true))
    assert(n.published_at.contains(java.sql.Timestamp.valueOf("2021-04-01 10:30:00")))
    assert(out.texts.head.date.contains("2021-04-01"))
  }

  test("S6: numbered-page pagination stops at the limit and on failure") {
    def page(n: Int, links: Seq[String]): (String, Document) =
      (s"https://news.example/?page=$n",
        Document(s"p$n", links.zipWithIndex.map { case (l, i) => Span("link", "t", l, i) }))
    val pages = (1 to 5).map(n => page(n, Seq(s"a$n-1", s"a$n-2"))).toMap
    val fetcher = new MapFetcher(pages)
    val (links, next) = graft.engine.Sources.numberedPageCrawl(
      fetcher, n => s"https://news.example/?page=$n",
      d => d.spans.map(_.media_ref), limit = 5)
    // page 3 pushes the count to 6 >= 5 → stop after page 3
    assert(links == Seq("a1-1", "a1-2", "a2-1", "a2-2", "a3-1", "a3-2"))
    assert(next == 4)
    // failure stop: limit unreachable, page 6 404s
    val (links2, _) = graft.engine.Sources.numberedPageCrawl(
      fetcher, n => s"https://news.example/?page=$n",
      d => d.spans.map(_.media_ref), limit = 100)
    assert(links2.length == 10)
  }

  // ------------------------------------------------------------------
  // TV family
  // ------------------------------------------------------------------

  private val shugiinTvListing = doc(
    "https://www.shugiintv.go.jp/jp/index.php?ex=VL&u_day=20210401",
    ("link", "内閣委員会", "https://www.shugiintv.go.jp/jp/index.php?ex=VL&deli_id=51234"),
    ("link", "本会議", "https://www.shugiintv.go.jp/jp/index.php?ex=VL&deli_id=51235"),
    ("link", "次の結果", "javascript:document.form1.h_page.value='2';document.form1.submit()"))

  test("E23/S7: deli_id + h_page extraction, form-POST follow-ups") {
    val (deliIds, hPages) = TvPages.parseShugiinTvListing(shugiinTvListing)
    assert(deliIds == Seq("51234", "51235"))
    assert(hPages == Seq("2"))
    val follows = TvPages.shugiinTvFollowUps(shugiinTvListing, shugiinTvListing.doc_id)
    assert(follows.count(_.parse_fn == "shugiin_tv_minutes") == 2)
    val post = follows.find(_.parse_fn == "shugiin_tv_listing").get
    assert(post.url.endsWith("&h_page=2"))
    assert(post.meta.get("method").contains("POST"))
  }

  test("E24: abbreviated meeting names map to official full names") {
    assert(TvPages.fullMeetingName("倫理選挙特別委員会") ==
      "政治倫理の確立及び公職選挙法改正に関する特別委員会")
    assert(TvPages.fullMeetingName("内閣委員会") == "内閣委員会")
  }

  private val shugiinTvMinutesPage = doc(
    "https://www.shugiintv.go.jp/jp/index.php?ex=VL&deli_id=51234",
    // library detail table: term at cell 1, desc at cell 3
    ("caption", "library", ""),
    ("row", "", ""), ("table_cell", "", ""), ("table_cell", "開会日", ""),
    ("table_cell", "", ""), ("table_cell", "2021年4月1日 (木)", ""),
    ("row", "", ""), ("table_cell", "", ""), ("table_cell", "会議名", ""),
    ("table_cell", "", ""), ("table_cell", "沖縄北方特別委員会 (3時間)", ""),
    // library2 table 1: topics (spacer rows = content)
    ("caption", "topics", ""),
    ("row", "", ""), ("table_cell", "案件", ""),
    ("row", "spacer", ""), ("table_cell", "犬法の一部を改正する法律案", ""),
    ("row", "spacer", ""), ("table_cell", "猫法案", ""),
    // library2 table 2: explanation (unused)
    ("caption", "unused", ""),
    ("row", "spacer", ""), ("table_cell", "説明", ""),
    // library2 table 3: speakers — R24 first-section-only
    ("caption", "speakers", ""),
    ("row", "", ""), ("table_cell", "発言者", ""),
    ("row", "spacer", ""), ("table_cell", "逢沢一郎（自民）", ""),
    ("row", "spacer", ""), ("table_cell", "蓮舫（立憲）", ""),
    ("row", "", ""), ("table_cell", "第二部", ""), // section boundary → stop
    ("row", "spacer", ""), ("table_cell", "第二部の人", ""),
    ("link", "逢沢一郎（自民）", "https://www.shugiintv.go.jp/sp/1"))

  test("R24 + shugiin TV minutes: date, full name, topics, first-section speakers") {
    val m = TvPages.parseShugiinTvMinutes(shugiinTvMinutesPage).get
    assert(m.name == "衆議院沖縄及び北方問題に関する特別委員会")
    assert(m.start_date_time == java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))
    assert(m.topics == Seq("犬法の一部を改正する法律案", "猫法案"))
    // R24: the second section's speaker is NOT scraped
    assert(m.speakers.map(_._1) == Seq("逢沢一郎（自民）"))
    assert(m.minutes_id == ScrapeFns.minutesId(m.name, "2021-04-01 00:00:00"))
  }

  private val sangiinTvPage = doc("https://www.webtv.sangiin.go.jp/webtv/detail.php?sid=7000",
    ("caption", "detail", ""),
    ("row", "", ""), ("table_cell", "開会日", ""), ("table_cell", "2021年4月2日", ""),
    ("row", "", ""), ("table_cell", "会議名", ""), ("table_cell", "内閣委員会、公聴会", ""),
    ("text", " 犬法について参考人から意見を聴取した。 ", ""),
    ("list_item", "犬法の一部を改正する法律案", ""),
    ("link", "蓮舫", "https://www.webtv.sangiin.go.jp/m/2"))

  test("sangiin TV minutes: 、-removed name, squeezed summary, list topics, link speakers") {
    val m = TvPages.parseSangiinTvMinutes(sangiinTvPage).get
    assert(m.name == "参議院内閣委員会公聴会")
    assert(m.summary.contains("犬法について参考人から意見を聴取した。"))
    assert(m.topics == Seq("犬法の一部を改正する法律案"))
    assert(m.speakers == Seq(("蓮舫", "https://www.webtv.sangiin.go.jp/m/2")))
  }

  test("R16: max sid / vrsdd id aggregates over the urls table") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val urls = Seq(
      UrlEntity("u1", "https://www.webtv.sangiin.go.jp/webtv/detail.php?sid=7031", "SHINGI_TYUKEI", "sangiin.go.jp", "M1"),
      UrlEntity("u2", "https://www.webtv.sangiin.go.jp/webtv/detail.php?sid=7029", "SHINGI_TYUKEI", "sangiin.go.jp", "M2"),
      UrlEntity("u3", "http://gclip1.grips.ac.jp/video/video/812", "VRSDD", "grips.ac.jp", "M1"),
      UrlEntity("u4", "http://gclip1.grips.ac.jp/video/video/907", "VRSDD", "grips.ac.jp", "M3"),
      UrlEntity("u5", "https://x/other", "HONBUN", "x", "B1")).toDF()
    assert(TvPages.lastSidOrNone(spark, urls).contains(7031L))
    assert(TvPages.lastVrsddIdOrNone(spark, urls).contains(907L))
    assert(TvPages.lastSidOrNone(spark, urls.filter($"title" === "HONBUN")).isEmpty)
  }

  test("E22-variant: vrsdd page title parse + modifier strip") {
    assert(TvPages.parseVrsddTitle("第204回[衆] 本会議 2021/04/01") ==
      Some(("衆議院", "本会議", java.time.LocalDateTime.of(2021, 4, 1, 0, 0))))
    assert(TvPages.parseVrsddTitle("第204回[参] [閉] 内閣委員会 2021/08/05").get._2 == "内閣委員会")
    assert(TvPages.parseVrsddTitle("ただのタイトル").isEmpty)
  }

  test("vrsdd tv/member pages reduce to (target, url) for the gated link") {
    val tv = doc("http://gclip1.grips.ac.jp/video/video/812",
      ("title", "第204回[衆] 本会議 2021/04/01", ""))
    val (mid, url) = TvPages.parseVrsddTv(tv).get
    assert(mid == ScrapeFns.minutesId("衆議院本会議", "2021-04-01 00:00:00"))
    assert(url.title == "VRSDD" && url.to_id == mid)
    val mem = doc("http://gclip1.grips.ac.jp/video/dietmember/3/show",
      ("title", "逢沢一郎", ""))
    assert(TvPages.parseVrsddMember(mem).contains(("逢沢一郎", mem.doc_id)))
  }

  test("TvSpiderTemplate: speaker→member join builds activities + SHINGI_TYUKEI urls") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val m = TvPages.parseShugiinTvMinutes(shugiinTvMinutesPage).get
    val members = Seq(
      Member(ScrapeFns.memberId("逢沢一郎（自民）"), "逢沢一郎（自民）"),
      Member(ScrapeFns.memberId("誰か"), "誰か")).toDS()
    val out = TvPages.activitiesAndUrls(spark, Seq(m).toDS(), members)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("minutes_id") == m.minutes_id)
    assert(rows.head.getAs[String]("url_title") == "SHINGI_TYUKEI")
  }

  // ------------------------------------------------------------------
  // minutes-news family
  // ------------------------------------------------------------------

  private val keikaPage = doc("https://www.sangiin.go.jp/keika/naikaku.html",
    ("caption", "内閣委員会経過", ""),
    ("caption", "令和3年4月1日", ""),
    ("text", " 犬法の一部を改正する法律案について質疑 を行った。 ", ""),
    ("caption", "令和3年4月8日", ""),
    ("text", "誤りにつき訂正します。", ""),
    ("caption", "令和3年4月15日", ""),
    ("text", "採決の結果可決した。", ""))

  test("sangiin keika: h4/pre caption-zip, committee from h2, correction skip") {
    val (items, quarantined) = MinutesNews.parseKeika(keikaPage)
    assert(items.map(_.summary) ==
      Seq("犬法の一部を改正する法律案について質疑を行った。", "採決の結果可決した。"))
    assert(items.forall(_.committee_name == "参議院内閣委員会"))
    assert(items.head.date == java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))
    assert(quarantined.isEmpty)
  }

  test("sangiin sitsugi: committee from h3 last token, dated anchors") {
    val page = doc("https://www.sangiin.go.jp/sitsugi/naikaku.html",
      ("caption", "質疑項目一覧　内閣委員会", ""),
      ("link", "令和3年4月1日", "https://www.sangiin.go.jp/sitsugi/1.html"),
      ("link", "令和3年4月8日", "https://www.sangiin.go.jp/sitsugi/2.html"))
    val (items, q) = MinutesNews.parseSitsugi(page)
    assert(items.length == 2)
    assert(items.forall(_.committee_name == "参議院内閣委員会"))
    assert(items.forall(_.url_title == "IINKAI_SITSUGI"))
    assert(q.isEmpty)
  }

  test("R10: minutes-by-(name,date) join resolves links and audits mismatches") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val (items, _) = MinutesNews.parseKeika(keikaPage)
    val minutes = Seq(
      Minutes(ScrapeFns.minutesId("参議院内閣委員会", "2021-04-01 00:00:00"),
        "参議院内閣委員会", java.sql.Timestamp.valueOf("2021-04-01 00:00:00")),
      // a DUPLICATE minutes for the same (name, date) → audit n=2
      Minutes("Minutes:dup", "参議院内閣委員会",
        java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))).toDS()
    val (resolved, audit) = MinutesNews.attachToMinutes(spark, items.toDS(), minutes)
    val r = resolved.collect()
    assert(r.length == 2) // the reference links every match
    val a = audit.collect()
    // 4/1 matched twice (audit) and 4/15 matched zero times (audit)
    assert(a.map(x => (x.date.toString.take(10), x.n_matches)).toSet ==
      Set(("2021-04-01", 2L), ("2021-04-15", 0L)))
  }

  test("shugiin minutes-news: committee fan-out, E22 title date, K4 gate") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val index = doc("https://www.shugiin.go.jp/IinkaiNews204_m.htm",
      ("caption", "", ""),
      ("row", "", ""), ("table_cell", "内閣委員会", "https://www.shugiin.go.jp/naikaku.htm"),
      ("table_cell", "法務委員会", "https://www.shugiin.go.jp/houmu.htm"))
    val follows = MinutesNews.parseShugiinCommitteeIndex(index)
    assert(follows.map(_.meta("committee_name")) == Seq("衆議院内閣委員会", "衆議院法務委員会"))

    val newsPage = doc("https://www.shugiin.go.jp/news/1.htm",
      ("title", "第204回国会4月1日内閣委員会ニュース", ""),
      ("link", "概要PDF", "https://www.shugiin.go.jp/pdf/n1.pdf"))
    val (mid, url) = MinutesNews.parseShugiinMinutesNews(
      newsPage, Map("committee_name" -> "衆議院内閣委員会"), dietYear = 2021).get
    assert(mid == ScrapeFns.minutesId("衆議院内閣委員会", "2021-04-01 00:00:00"))
    assert(url.title == "GAIYOU_PDF")

    // K4: url kept only when the minutes exists
    val minutesDim = Seq(Minutes(mid, "衆議院内閣委員会",
      java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))).toDS()
    val kept = MinutesNews.gateOnMinutes(spark, Seq(url).toDS(), minutesDim).collect()
    assert(kept.length == 1)
    val dropped = MinutesNews.gateOnMinutes(spark,
      Seq(url.copy(to_id = "Minutes:nonexistent")).toDS(), minutesDim).collect()
    assert(dropped.isEmpty)
  }
}
