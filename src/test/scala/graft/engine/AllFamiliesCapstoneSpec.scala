package graft.engine

import graft.SparkTestSession
import graft.extract.ScrapeFns
import graft.extract.transforms._
import graft.fetch.MapFetcher
import graft.model._
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * CAPSTONE (VERDICT r4 #5): ONE synthetic Diet-site corpus crawled by
 * EVERY spider family in a single WaveEngine run — shugiin bills (3-level),
 * sangiin bills (+404 meisai), members (list→detail), kokkai minutes API
 * (cursor pagination as link-follow), sangiin minutes-news (keika +
 * sitsugi), shugiin minutes-news (committee fan-out + K4 gate), shugiin
 * TV, sangiin TV, vrsdd TV + member (K4 gate), ministry bill-URL tables,
 * and mainichi news — asserting:
 *
 *  1. crawl parity vs [[ReferenceScheduler]]: exact fetch ORDER in
 *     referenceOrder mode, and URL-seen SET equality in scalable mode;
 *  2. the per-row SPAN invariant: every fetched document's span sequence
 *     (kind, text, media_ref, order) equals the corpus page exactly;
 *  3. every family's entities land in the SAME entity/edge/url/text
 *     tables through the K1-K6 sinks, including both outcomes of the K4
 *     existence gates on the vrsdd and shugiin minutes-news paths.
 */
/** Corpus, parsers and seeds in a STATIC context: parser closures must
  * not capture the ScalaTest suite (non-serializable) when Spark ships
  * them to tasks. */
private object CapstoneSite {
  import Fixtures.doc

  // ===================================================================
  // The corpus: one page map covering every family.
  // ===================================================================

  // --- shugiin bills (index → keika/honbun → houan) — WaveE2E shapes --
  val shugiinIndexUrl = "https://www.shugiin.go.jp/kaiji204.htm"
  val keika1 = doc("https://www.shugiin.go.jp/keika/g20409001.htm",
    ("caption", "経過", ""),
    ("row", "", ""), ("table_cell", "議案提出の賛成者", ""),
    ("table_cell", "自由民主党", ""))
  val keika2 = doc("https://www.shugiin.go.jp/keika/g20409002.htm",
    ("caption", "経過", ""),
    ("row", "", ""), ("table_cell", "備考", ""), ("table_cell", "", ""))
  val honbun1 = doc("https://www.shugiin.go.jp/honbun/g20409001.htm",
    ("link", "提出時法律案", "https://www.shugiin.go.jp/houan/g20409001.htm"))
  val houan1 = doc("https://www.shugiin.go.jp/houan/g20409001.htm",
    ("text", "犬法の一部を次のように改正する。", ""),
    ("text", "附 則", ""),
    ("text", "この法律は、公布の日から施行する。", ""),
    ("text", "理 由", ""),
    ("text", "誤字を修正するため。", ""))
  val honbun5 = doc("https://www.shugiin.go.jp/honbun/g20405005.htm",
    ("link", "提出時法律案", "https://www.shugiin.go.jp/houan/g20405005.htm"))
  val houan5 =
    Document("https://www.shugiin.go.jp/houan/g20405005.htm", Fixtures.houanPage.spans)

  // --- minutes API (S5 cursor pagination as link-follow) -------------
  def apiUrl(cursor: Long) =
    s"https://kokkai.ndl.go.jp/api/meeting?maximumRecords=5&startRecord=$cursor"
  val firstSpeech =
    "本日の会議に付した案件\\n　犬法の一部を改正する法律案（内閣提出）\\n　猫法案（内閣提出）\\n　　　　――――◇―――――"
  val apiPage1 = Document(apiUrl(1), Seq(Span("json",
    s"""{"meetingRecord": [
       |  {"issueID": "iss1", "nameOfHouse": "衆議院", "nameOfMeeting": "法務委員会",
       |   "date": "2021-03-09", "meetingURL": "https://kokkai.ndl.go.jp/m1",
       |   "speechRecord": [
       |     {"speechOrder": 0, "speaker": "会議録情報", "speech": "$firstSpeech", "speechURL": "https://kokkai.ndl.go.jp/s0"},
       |     {"speechOrder": 1, "speaker": "猫山委員長", "speech": "○猫山委員長　犬法の一部を改正する法律案（内閣提出）を議題とします。質疑に入ります", "speechURL": "https://kokkai.ndl.go.jp/s1"},
       |     {"speechOrder": 2, "speaker": "逢沢一郎", "speech": "○逢沢一郎君　質問です が", "speechURL": "https://kokkai.ndl.go.jp/s2"},
       |     {"speechOrder": 3, "speaker": "猫山委員長", "speech": "○猫山委員長　採決に入ります", "speechURL": "https://kokkai.ndl.go.jp/s3"}
       |   ]}],
       | "nextRecordPosition": 6}""".stripMargin, "", 0)))
  val apiPage2 = Document(apiUrl(6), Seq(Span("json",
    s"""{"meetingRecord": [
       |  {"issueID": "iss2", "nameOfHouse": "参議院", "nameOfMeeting": "内閣委員会",
       |   "date": "2021-04-01", "meetingURL": "https://kokkai.ndl.go.jp/m2",
       |   "speechRecord": [
       |     {"speechOrder": 0, "speaker": "会議録情報", "speech": "案件", "speechURL": "https://kokkai.ndl.go.jp/s4"},
       |     {"speechOrder": 1, "speaker": "逢沢一郎", "speech": "○逢沢一郎君　意見です", "speechURL": "https://kokkai.ndl.go.jp/s5"}
       |   ]},
       |  {"issueID": "iss3", "nameOfHouse": "衆議院", "nameOfMeeting": "本会議",
       |   "date": "2021-04-01", "meetingURL": "https://kokkai.ndl.go.jp/m3",
       |   "speechRecord": [
       |     {"speechOrder": 0, "speaker": "会議録情報", "speech": "案件", "speechURL": "https://kokkai.ndl.go.jp/s6"},
       |     {"speechOrder": 1, "speaker": "猫山議長", "speech": "○猫山議長　開会します", "speechURL": "https://kokkai.ndl.go.jp/s7"}
       |   ]}],
       | "nextRecordPosition": null}""".stripMargin, "", 0)))

  // --- sangiin minutes-news (keika + sitsugi) ------------------------
  val sangiinKeikaPage = doc("https://www.sangiin.go.jp/keika/naikaku.html",
    ("caption", "内閣委員会経過", ""),
    ("caption", "令和3年4月1日", ""),
    ("text", " 犬法の一部を改正する法律案について質疑 を行った。 ", ""),
    ("caption", "令和3年4月15日", ""),
    ("text", "採決の結果可決した。", ""))
  val sangiinSitsugiPage = doc("https://www.sangiin.go.jp/sitsugi/naikaku.html",
    ("caption", "質疑項目一覧　内閣委員会", ""),
    ("link", "令和3年4月1日", "https://www.sangiin.go.jp/sitsugi/1.html"),
    ("link", "令和3年4月8日", "https://www.sangiin.go.jp/sitsugi/2.html"))

  // --- shugiin minutes-news (committee fan-out, K4) ------------------
  val committeeIndex = doc("https://www.shugiin.go.jp/IinkaiNews204_m.htm",
    ("caption", "", ""),
    ("row", "", ""), ("table_cell", "内閣委員会", "https://www.shugiin.go.jp/naikaku.htm"),
    ("table_cell", "法務委員会", "https://www.shugiin.go.jp/houmu.htm"))
  val naikakuNews = doc("https://www.shugiin.go.jp/naikaku.htm",
    ("link", "第1号", "https://www.shugiin.go.jp/news/n1.htm"))
  val houmuNews = doc("https://www.shugiin.go.jp/houmu.htm",
    ("link", "第1号", "https://www.shugiin.go.jp/news/h1.htm"))
  // targets 衆議院内閣委員会 2021-04-01 — NO such minutes → K4 must DROP
  val newsN1 = doc("https://www.shugiin.go.jp/news/n1.htm",
    ("title", "第204回国会4月1日内閣委員会ニュース", ""),
    ("link", "概要PDF", "https://www.shugiin.go.jp/pdf/n1.pdf"))
  // targets 衆議院法務委員会 2021-03-09 — EXISTS (API iss1) → K4 keeps
  val newsH1 = doc("https://www.shugiin.go.jp/news/h1.htm",
    ("title", "第204回国会3月9日法務委員会ニュース", ""),
    ("link", "概要PDF", "https://www.shugiin.go.jp/pdf/h1.pdf"))

  // --- TV + vrsdd ----------------------------------------------------
  val shugiinTvPage = doc(
    "https://www.shugiintv.go.jp/jp/index.php?ex=VL&deli_id=51234",
    ("caption", "library", ""),
    ("row", "", ""), ("table_cell", "", ""), ("table_cell", "開会日", ""),
    ("table_cell", "", ""), ("table_cell", "2021年4月1日 (木)", ""),
    ("row", "", ""), ("table_cell", "", ""), ("table_cell", "会議名", ""),
    ("table_cell", "", ""), ("table_cell", "沖縄北方特別委員会 (3時間)", ""),
    ("caption", "topics", ""),
    ("row", "", ""), ("table_cell", "案件", ""),
    ("row", "spacer", ""), ("table_cell", "犬法の一部を改正する法律案", ""),
    ("caption", "unused", ""),
    ("row", "spacer", ""), ("table_cell", "説明", ""),
    ("caption", "speakers", ""),
    ("row", "", ""), ("table_cell", "発言者", ""),
    ("row", "spacer", ""), ("table_cell", "逢沢一郎", ""),
    ("link", "逢沢一郎", "https://www.shugiintv.go.jp/sp/1"))
  val sangiinTvPage = doc("https://www.webtv.sangiin.go.jp/webtv/detail.php?sid=7000",
    ("caption", "detail", ""),
    ("row", "", ""), ("table_cell", "開会日", ""), ("table_cell", "2021年4月2日", ""),
    ("row", "", ""), ("table_cell", "会議名", ""), ("table_cell", "内閣委員会、公聴会", ""),
    ("text", " 犬法について参考人から意見を聴取した。 ", ""),
    ("list_item", "犬法の一部を改正する法律案", ""),
    ("link", "蓮舫", "https://www.webtv.sangiin.go.jp/m/2"))
  // vrsdd 812 targets 衆議院本会議 2021-04-01 (EXISTS via iss3) → kept;
  // vrsdd 813 targets 参議院本会議 2021-04-05 (absent) → dropped
  val vrsddTv812 = doc("http://gclip1.grips.ac.jp/video/video/812",
    ("title", "第204回[衆] 本会議 2021/04/01", ""))
  val vrsddTv813 = doc("http://gclip1.grips.ac.jp/video/video/813",
    ("title", "第204回[参] 本会議 2021/04/05", ""))
  val vrsddMember3 = doc("http://gclip1.grips.ac.jp/video/dietmember/3/show",
    ("title", "逢沢一郎", ""))

  // --- news ----------------------------------------------------------
  val mainichiArticle = doc("https://mainichi.jp/articles/20210401/k00/1",
    ("title", " 犬法改正案が衆院通過 ", ""),
    ("json",
      """{"@type":"NewsArticle","image":{"url":"https://cdn.example.jp/thumb.jpg"},
        |"datePublished":"2021-04-01T10:30:00+0900",
        |"dateModified":"2021-04-02T08:00:00+0900"}""".stripMargin, ""),
    ("text", " 犬法改正案は1日、衆院本会議で可決された。 ", ""),
    ("text", "この記事は有料記事です。", ""))

  val pages: Map[String, Document] = Map(
    shugiinIndexUrl -> Document(shugiinIndexUrl, Fixtures.shugiinIndex.spans),
    keika1.doc_id -> keika1, keika2.doc_id -> keika2,
    Fixtures.keikaPage.doc_id -> Fixtures.keikaPage,
    honbun1.doc_id -> honbun1, houan1.doc_id -> houan1,
    honbun5.doc_id -> honbun5, houan5.doc_id -> houan5,
    Fixtures.sangiinIndex.doc_id -> Fixtures.sangiinIndex,
    Fixtures.sangiinMeisai.doc_id -> Fixtures.sangiinMeisai, // m20409001 absent → 404
    Fixtures.memberList.doc_id -> Fixtures.memberList,
    Fixtures.memberDetail.doc_id -> Fixtures.memberDetail,
    apiPage1.doc_id -> apiPage1, apiPage2.doc_id -> apiPage2,
    sangiinKeikaPage.doc_id -> sangiinKeikaPage,
    sangiinSitsugiPage.doc_id -> sangiinSitsugiPage,
    committeeIndex.doc_id -> committeeIndex,
    naikakuNews.doc_id -> naikakuNews, houmuNews.doc_id -> houmuNews,
    newsN1.doc_id -> newsN1, newsH1.doc_id -> newsH1,
    shugiinTvPage.doc_id -> shugiinTvPage, sangiinTvPage.doc_id -> sangiinTvPage,
    vrsddTv812.doc_id -> vrsddTv812, vrsddTv813.doc_id -> vrsddTv813,
    vrsddMember3.doc_id -> vrsddMember3,
    Fixtures.ministryPage.doc_id -> Fixtures.ministryPage,
    mainichiArticle.doc_id -> mainichiArticle)
  val site = new MapFetcher(pages)

  // ===================================================================
  // Parsers (frontier expansion only — one map shared by the engine AND
  // the ReferenceScheduler oracle, so parity is over identical emission).
  // ===================================================================
  def pp(f: (Document, Map[String, String]) => Seq[FollowUp]): PageParser =
    new PageParser {
      def followUps(doc: Document, meta: Map[String, String]) = f(doc, meta)
    }
  val minutesApiParser = pp { (doc, _) =>
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = SpanTables.jsonBody(doc).getOrElse("{}")
    val next = Option(mapper.readTree(body).get("nextRecordPosition"))
      .filterNot(_.isNull).map(_.asLong())
    next.map(c => FollowUp(apiUrl(c), "minutes_api")).toSeq
  }
  val parsers: Map[String, PageParser] = Map(
    "shugiin_index" -> pp((d, _) => ShugiinBills.parse(d).follow),
    "shugiin_honbun" -> pp((d, m) => ShugiinBills.parseHonbun(d, m).follow),
    "shugiin_houan" -> NoFollow,
    "shugiin_keika" -> NoFollow,
    "sangiin_index" -> pp((d, _) => SangiinBills.parse(d).follow),
    "sangiin_meisai" -> NoFollow,
    "member_list" -> pp((d, _) => Members.parseList(d).follow),
    "member_detail" -> NoFollow,
    "minutes_api" -> minutesApiParser,
    "sangiin_keika_news" -> NoFollow,
    "sangiin_sitsugi_news" -> NoFollow,
    "shugiin_committee_index" -> pp((d, _) => MinutesNews.parseShugiinCommitteeIndex(d)),
    "shugiin_committee_news" -> pp((d, m) => MinutesNews.parseShugiinCommitteeNews(d, m)),
    "shugiin_minutes_news" -> NoFollow,
    "shugiin_tv_minutes" -> NoFollow,
    "sangiin_tv_minutes" -> NoFollow,
    "vrsdd_tv" -> NoFollow,
    "vrsdd_member" -> NoFollow,
    "ministry_cao" -> NoFollow,
    "mainichi_news" -> NoFollow)

  val seeds = Seq(
    SeedSpec(shugiinIndexUrl, parseFn = "shugiin_index"),
    SeedSpec(Fixtures.sangiinIndex.doc_id, parseFn = "sangiin_index"),
    SeedSpec(Fixtures.memberList.doc_id, parseFn = "member_list"),
    SeedSpec(apiUrl(1), parseFn = "minutes_api"),
    SeedSpec(sangiinKeikaPage.doc_id, parseFn = "sangiin_keika_news"),
    SeedSpec(sangiinSitsugiPage.doc_id, parseFn = "sangiin_sitsugi_news"),
    SeedSpec(committeeIndex.doc_id, parseFn = "shugiin_committee_index"),
    SeedSpec(shugiinTvPage.doc_id, parseFn = "shugiin_tv_minutes"),
    SeedSpec(sangiinTvPage.doc_id, parseFn = "sangiin_tv_minutes"),
    SeedSpec(vrsddTv812.doc_id, parseFn = "vrsdd_tv"),
    SeedSpec(vrsddTv813.doc_id, parseFn = "vrsdd_tv"),
    SeedSpec(vrsddMember3.doc_id, parseFn = "vrsdd_member"),
    SeedSpec(Fixtures.ministryPage.doc_id, parseFn = "ministry_cao"),
    SeedSpec(mainichiArticle.doc_id, parseFn = "mainichi_news"))

}

class AllFamiliesCapstoneSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import CapstoneSite._
  private val seenReadSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("url_hash", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("canonical", org.apache.spark.sql.types.StringType)))
  private def seenCanonSet(ckpt: String): Set[String] =
    spark.read.schema(seenReadSchema).option("recursiveFileLookup", "true")
      .parquet(s"$ckpt/seen").select("canonical").as[String].collect().toSet

  test("capstone: all families, one crawl — reference parity, span invariant, shared tables, K4 gates") {
    val (oracleOrder, oracleSeen) = ReferenceScheduler.crawl(seeds, site, parsers)

    // ---- reference-order parity (exact Scrapy LIFO replay) ----------
    val refCkpt = SparkTestSession.tmpDir("capstone-ref")
    val refEngine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = refCkpt, referenceOrder = true,
        hostBuckets = 8, fetchPartitions = 2))
    val refRes = refEngine.run(seeds)
    val refOrder = refEngine.fetchedTable()
      .orderBy($"wave", $"host", $"slot").select($"canonical").as[String]
      .collect().toSeq
    assert(refOrder == oracleOrder, "reference-order replay must equal the Scrapy oracle")
    assert(refRes.fetched == oracleOrder.size)

    // ---- scalable crawl: the run everything downstream consumes -----
    val ckpt = SparkTestSession.tmpDir("capstone")
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = ckpt, hostBuckets = 8, fetchPartitions = 4))
    val res = engine.run(seeds)
    assert(res.fetched == oracleOrder.size)
    assert(seenCanonSet(ckpt) == oracleSeen, "URL-seen set must equal the oracle's")

    val fetched = engine.fetchedTable().cache()

    // ---- per-row span invariant: (kind, text, media_ref, order) -----
    val crawledSpans = fetched.filter($"status" === 200)
      .select($"doc_id", $"spans").as[(String, Seq[Span])].collect().toMap
    assert(crawledSpans.size == pages.size) // every page fetched exactly once
    crawledSpans.foreach { case (docId, spans) =>
      val expect = pages(docId).spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) == expect,
        s"span sequence of $docId diverged")
    }
    // exactly one 404 (the absent meisai), recorded as data (S13)
    val notFound = fetched.filter($"status" === 404)
      .select($"canonical").as[String].collect().toSeq
    assert(notFound == Seq("https://www.sangiin.go.jp/meisai/m20409001.htm"))

    // ---- transforms, dispatched on parse_fn -------------------------
    val rows = fetched.filter($"status" === 200)
      .select($"parse_fn", $"meta", $"doc_id", $"spans")
      .as[(String, Map[String, String], String, Seq[Span])].collect().toSeq
    def outsOf(fn: String, f: (Document, Map[String, String]) => ParseOut): Seq[ParseOut] =
      rows.filter(_._1 == fn).map { case (_, m, id, sp) => f(Document(id, sp), m) }
    val shuIndex = outsOf("shugiin_index", (d, _) => ShugiinBills.parse(d))
    val shuHonbun = outsOf("shugiin_honbun", (d, m) => ShugiinBills.parseHonbun(d, m))
    val shuHouan = outsOf("shugiin_houan", (d, m) => ShugiinBills.parseHouan(d, m))
    val shuKeika = outsOf("shugiin_keika", (d, m) => ShugiinBills.parseKeika(d, m))
    val sanIndex = outsOf("sangiin_index", (d, _) => SangiinBills.parse(d))
    val meisai = rows.filter(_._1 == "sangiin_meisai").flatMap { case (_, m, id, sp) =>
      SangiinBills.parseMeisai(Document(id, sp), m)
    }
    val memList = outsOf("member_list", (d, _) => Members.parseList(d))
    val memDetail = outsOf("member_detail", (d, m) => Members.parseDetail(d, m))

    // K6: both index pages quarantined their arity-violating rows
    assert((shuIndex ++ sanIndex).flatMap(_.quarantined).size >= 2)

    // ---- the SHARED tables every family lands in --------------------
    val root = SparkTestSession.tmpDir("capstone-tables")
    val bills = new SnapshotTable(spark, s"$root/bills")
    val members = new SnapshotTable(spark, s"$root/members")
    val minutes = new SnapshotTable(spark, s"$root/minutes")
    val news = new SnapshotTable(spark, s"$root/news")
    val urls = new SnapshotTable(spark, s"$root/urls")
    val edges = new SnapshotTable(spark, s"$root/edges")
    val texts = new SnapshotTable(spark, s"$root/texts")

    // bills: shugiin + sangiin full rows, then partial-field updates
    bills.merge(shuIndex.flatMap(_.bills).toDF())
    bills.merge(sanIndex.flatMap(_.bills).toDF())
    bills.merge(shuHouan.flatMap(_.bills).toDF().select($"id", $"reason"))
    bills.merge(shuKeika.flatMap(_.bills).toDF()
      .select($"id", $"supported_groups", $"opposed_groups"))
    bills.merge(meisai.toDF().select($"bill_id".as("id"), $"submitted_date",
      $"passed_councilors_committee_date", $"passed_councilors_date",
      $"passed_representatives_committee_date", $"passed_representatives_date",
      $"first_house", $"is_passed"))

    // members: list rows, then the detail partial
    members.merge(memList.flatMap(_.members).toDF())
    members.merge(memDetail.flatMap(_.members).toDF()
      .select($"id", $"first_name", $"last_name", $"first_name_hira",
        $"last_name_hira", $"description", $"image"))

    // minutes API pipeline (bills + members dims from THIS crawl)
    val billDim = bills.read().select($"id", $"name").as[(String, String)]
      .collect().toSeq.map { case (i, n) => (i, Option(n).getOrElse("")) }
    val memberDim = members.read().select($"name", $"id").as[(String, String)]
      .collect().toSeq
    val apiDocs = rows.filter(_._1 == "minutes_api")
      .map { case (_, _, id, sp) => Document(id, sp) }
    val mp = MinutesPipeline.run(spark, spark.createDataset(apiDocs), billDim, memberDim)
    minutes.merge(mp.minutes.toDF())
    texts.merge(mp.speechTexts.toDF())
    texts.merge(mp.minutesTexts.toDF())

    // TV minutes merge INTO THE SAME minutes table (K1, partial columns)
    val shuTv = rows.filter(_._1 == "shugiin_tv_minutes")
      .flatMap { case (_, _, id, sp) => TvPages.parseShugiinTvMinutes(Document(id, sp)) }
    val sanTv = rows.filter(_._1 == "sangiin_tv_minutes")
      .flatMap { case (_, _, id, sp) => TvPages.parseSangiinTvMinutes(Document(id, sp)) }
    minutes.merge((shuTv ++ sanTv).map(t =>
      Minutes(t.minutes_id, t.name, t.start_date_time, topics = t.topics)).toDF())

    // urls/edges from the bill/member families
    val famUrls = (shuIndex ++ shuHonbun ++ memList).flatMap(_.urls)
    urls.merge(famUrls.toDF())
    edges.mergeEdges((shuIndex ++ shuHonbun ++ memList).flatMap(_.edges).toDF())

    // ministry bill-URL join (R7) against the merged bills
    val caoTriples = rows.filter(_._1 == "ministry_cao").flatMap { case (_, _, id, sp) =>
      MinistryBillUrls.parse(Document(id, sp),
        MinistryBillUrls.Params("cao.go.jp", 0, 0, 1))
    }
    val (caoUrls, caoEdges, caoUnmatched) = BillUrlJoin.attach(spark,
      caoTriples.toDS(), bills.read().as[Bill], "cao.go.jp")
    assert(caoUnmatched.collect().isEmpty) // 犬法 + 猫法案 both resolve
    urls.merge(caoUrls.toDF())
    edges.mergeEdges(caoEdges.toDF())

    // TV activities: speaker → member join over the crawled member table
    val tvActs = TvPages.activitiesAndUrls(spark, shuTv.toDS(), members.read().as[Member])
      .collect()
    assert(tvActs.length == 1 &&
      tvActs.head.getAs[String]("minutes_id") == shuTv.head.minutes_id)
    urls.merge(tvActs.toSeq.map(r => UrlEntity(r.getAs[String]("url_id"),
      r.getAs[String]("url"), r.getAs[String]("url_title"),
      r.getAs[String]("domain"), r.getAs[String]("minutes_id"))).toDF())
    edges.mergeEdges(tvActs.toSeq.map(r =>
      Edge(r.getAs[String]("member_id"), r.getAs[String]("minutes_id"))).toDF())

    // ---- K4 existence gates (both outcomes on both paths) -----------
    val minutesDim = minutes.read().as[Minutes]
    // vrsdd: 812 targets minutes that exist (iss3), 813 doesn't
    val vrsddUrls = rows.filter(_._1 == "vrsdd_tv").flatMap { case (_, _, id, sp) =>
      TvPages.parseVrsddTv(Document(id, sp)).map(_._2)
    }
    assert(vrsddUrls.size == 2)
    val vrsddKept = MinutesNews.gateOnMinutes(spark, vrsddUrls.toDS(), minutesDim).collect()
    assert(vrsddKept.map(_.url).toSeq == Seq(vrsddTv812.doc_id),
      "K4 must keep 812 (minutes exists) and drop 813 (no minutes)")
    urls.merge(vrsddKept.toSeq.toDF())
    edges.mergeEdges(vrsddKept.map(u => Edge(u.id, u.to_id)).toSeq.toDF())
    // vrsdd member video → member link by name
    val vrsddMem = rows.filter(_._1 == "vrsdd_member").flatMap { case (_, _, id, sp) =>
      TvPages.parseVrsddMember(Document(id, sp))
    }
    val memByName = members.read().select($"name", $"id").as[(String, String)]
      .collect().toMap
    val vrsddMemUrls = vrsddMem.flatMap { case (name, url) =>
      memByName.get(name).map(mid =>
        UrlEntity(ScrapeFns.urlId(url), url, "VRSDD", "grips.ac.jp", mid))
    }
    assert(vrsddMemUrls.size == 1)
    urls.merge(vrsddMemUrls.toDF())

    // shugiin minutes-news: h1 kept (iss1 minutes), n1 dropped
    val newsUrls = rows.filter(_._1 == "shugiin_minutes_news")
      .flatMap { case (_, m, id, sp) =>
        MinutesNews.parseShugiinMinutesNews(Document(id, sp), m, dietYear = 2021)
      }.map(_._2)
    assert(newsUrls.size == 2)
    val newsKept = MinutesNews.gateOnMinutes(spark, newsUrls.toDS(), minutesDim).collect()
    assert(newsKept.map(_.url).toSeq == Seq("https://www.shugiin.go.jp/pdf/h1.pdf"),
      "K4 must keep the 法務 news (minutes exists) and drop the 内閣 news")
    urls.merge(newsKept.toSeq.toDF())

    // sangiin minutes-news: keika + sitsugi items resolve by (name, date)
    val keikaItems = rows.filter(r =>
        r._1 == "sangiin_keika_news" || r._1 == "sangiin_sitsugi_news")
      .flatMap { case (fn, _, id, sp) =>
        val d = Document(id, sp)
        (if (fn == "sangiin_keika_news") MinutesNews.parseKeika(d)
         else MinutesNews.parseSitsugi(d))._1
      }
    val (resolved, audit) = MinutesNews.attachToMinutes(spark, keikaItems.toDS(), minutesDim)
    val resolvedRows = resolved.collect()
    // keika 4/1 + sitsugi 4/1 resolve onto iss2; 4/15 and 4/8 have no minutes
    assert(resolvedRows.length == 2)
    // two independent asserts (the old single expression nested the
    // committee-name forall INSIDE the id predicate, so the id equality —
    // the cross-family contract this capstone exists to prove — was never
    // actually exercised; and the expected id used Timestamp.toString's
    // trailing ".0", which no producer emits)
    assert(resolvedRows.forall(_.minutes_id ==
      ScrapeFns.minutesId("参議院内閣委員会", "2021-04-01 00:00:00")))
    assert(resolvedRows.forall(_.committee_name == "参議院内閣委員会"))
    assert(audit.collect().count(_.n_matches == 0L) == 2)
    urls.merge(resolvedRows.map(r =>
      UrlEntity(ScrapeFns.urlId(r.url), r.url, r.url_title, "sangiin.go.jp",
        r.minutes_id)).toSeq.toDF())

    // news family
    val newsOuts = rows.filter(_._1 == "mainichi_news").map { case (_, _, id, sp) =>
      NewsPages.parseMainichiNews(Document(id, sp))
    }
    news.merge(newsOuts.flatMap(_.news).toDF())
    texts.merge(newsOuts.flatMap(_.texts).toDF())
    texts.merge(shuHouan.flatMap(_.texts).toDF())
    texts.merge(memDetail.flatMap(_.texts).toDF())

    // ---- final cross-family assertions over the shared tables -------
    val billRows = bills.read().collect().map(r => r.getAs[String]("bill_number") -> r).toMap
    // 204-閣-1 was built by BOTH indexes and enriched by houan (reason):
    val dog = billRows("204-閣-1")
    assert(dog.getAs[String]("name") == "犬法の一部を改正する法律案")
    assert(dog.getAs[String]("reason") == "誤字を修正するため。")
    // sangiin meisai lifecycle landed on the 参法:
    val usagi = billRows("204-参-9")
    assert(usagi.getAs[java.sql.Timestamp]("submitted_date") ==
      java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))
    assert(usagi.getAs[java.sql.Timestamp]("passed_councilors_date") ==
      java.sql.Timestamp.valueOf("2021-04-15 00:00:00"))
    // shugiin keika groups landed on the 衆法:
    val rabbit = billRows("204-衆-5")
    assert(rabbit.getAs[scala.collection.Seq[String]]("supported_groups").nonEmpty)

    // member enriched across list + detail + linked to TV + vrsdd
    val aisawa = members.read().filter($"name" === "逢沢一郎").collect().head
    assert(aisawa.getAs[String]("house") == "REPRESENTATIVES")
    assert(Option(aisawa.getAs[String]("description")).exists(_.nonEmpty))

    // minutes table holds API + TV families side by side
    val minuteNames = minutes.read().select($"name").as[String].collect().toSet
    assert(minuteNames == Set("衆議院法務委員会", "参議院内閣委員会", "衆議院本会議",
      "衆議院沖縄及び北方問題に関する特別委員会", "参議院内閣委員会公聴会"))
    // API minutes resolved topic → bill id through THIS crawl's bills
    val houmu = minutes.read().filter($"name" === "衆議院法務委員会").collect().head
    assert(houmu.getAs[scala.collection.Seq[String]]("topic_ids").toSet ==
      Set(ScrapeFns.billId("204-閣-1"), ScrapeFns.billId("204-閣-2")))

    // url table: every family's url rows in ONE table
    val urlTitles = urls.read().select($"title").as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(urlTitles.keySet.intersect(Set("HONBUN", "KEIKA")).nonEmpty) // shugiin bills
    assert(urlTitles.contains("GIIN_ZYOUHOU")) // members
    assert(urlTitles("GAIYOU_PDF") == 2) // ministry + gated shugiin news
    assert(urlTitles("SINKYU_PDF") == 1) // ministry
    assert(urlTitles("VRSDD") == 2) // gated tv video + member video
    assert(urlTitles("SHINGI_TYUKEI") == 1) // shugiin TV
    assert(urlTitles("IINKAI_KEIKA") >= 1 || urlTitles.contains("IINKAI_SITSUGI"))

    // news + texts
    val n = news.read().collect().head
    assert(n.getAs[String]("publisher") == "毎日新聞" && n.getAs[Boolean]("is_paid"))
    assert(texts.read().count() >= 5) // speeches + minutes + houan + member + news

    // edges connect across families (member↔minutes, bill↔url, url↔minutes)
    assert(edges.read().count() >= 5)
    fetched.unpersist()
  }
}
