package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model.{Document, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture builders for span-encoded pages (FIXTURES.md §3 shapes). */
object Fixtures {
  def doc(id: String, spans: (String, String, String)*): Document =
    Document(id, spans.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) })

  /** shugiin bill index page: caption + header row + bill rows. */
  val shugiinIndex: Document = doc("https://www.shugiin.go.jp/kaiji204.htm",
    ("title", "第204回国会 議案の一覧", ""),
    ("caption", "閣法の一覧", ""),
    ("row", "", ""), ("table_cell", "提出回次", ""), ("table_cell", "番号", ""),
    ("table_cell", "議案件名", ""), ("table_cell", "審議状況", ""),
    ("table_cell", "経過", ""), ("table_cell", "本文", ""),
    ("row", "", ""),
    ("table_cell", "204", ""), ("table_cell", "1", ""),
    ("table_cell", "犬法の一部を改正する法律案", ""), ("table_cell", "可決", ""),
    ("table_cell", "経過", "https://www.shugiin.go.jp/keika/g20409001.htm"),
    ("table_cell", "本文", "https://www.shugiin.go.jp/honbun/g20409001.htm"),
    ("row", "", ""),
    ("table_cell", "204", ""), ("table_cell", "2", ""),
    ("table_cell", "猫法案", ""), ("table_cell", "審議中", ""),
    ("table_cell", "経過", "https://www.shugiin.go.jp/keika/g20409002.htm"),
    ("table_cell", "本文", ""),
    ("caption", "衆法の一覧", ""),
    ("row", "", ""), ("table_cell", "h", ""), ("table_cell", "h", ""),
    ("table_cell", "h", ""), ("table_cell", "h", ""), ("table_cell", "h", ""), ("table_cell", "h", ""),
    ("row", "", ""),
    ("table_cell", "204", ""), ("table_cell", "5", ""),
    ("table_cell", "うさぎ法案", ""), ("table_cell", "", ""),
    ("table_cell", "経過", "https://www.shugiin.go.jp/keika/g20405005.htm"),
    ("table_cell", "本文", "https://www.shugiin.go.jp/honbun/g20405005.htm"),
    ("row", "", ""), // arity violation → quarantine
    ("table_cell", "204", ""), ("table_cell", "6", ""))

  val houanPage: Document = doc("https://www.shugiin.go.jp/honbun/g20409001.htm",
    ("title", "犬法の一部を改正する法律案", ""),
    ("text", "犬法の一部を次のように改正する。", ""),
    ("text", "「芝犬」を「柴犬」に改める。", ""),
    ("text", "附 則", ""),
    ("text", "この法律は、公布の日から施行する。", ""),
    ("text", "理 由", ""),
    ("text", "誤字を修正するため。", ""))

  val keikaPage: Document = doc("https://www.shugiin.go.jp/keika/g20405005.htm",
    ("caption", "経過", ""),
    ("row", "", ""), ("table_cell", "議案提出の賛成者", ""),
    ("table_cell", "自由民主党・無所属の会; 公明党", ""),
    ("row", "", ""), ("table_cell", "議案提出の反対者", ""),
    ("table_cell", "立憲民主党・無所属", ""))

  val memberList: Document = doc("https://www.shugiin.go.jp/giin/1giin.htm",
    ("caption", "議員一覧", ""),
    ("row", "", ""), ("table_cell", "氏名", ""), ("table_cell", "ふりがな", ""),
    ("table_cell", "会派", ""), ("table_cell", "選挙区", ""), ("table_cell", "当選回数", ""),
    ("row", "", ""),
    ("table_cell", "逢沢　一郎君", "https://www.shugiin.go.jp/profile/aisawa.htm"),
    ("table_cell", "あいさわ　いちろう", ""),
    ("table_cell", "自民", ""), ("table_cell", "岡山1区", ""), ("table_cell", "12", ""))

  val memberDetail: Document = doc("https://www.shugiin.go.jp/profile/aisawa.htm",
    ("title", "逢沢　一郎（あいさわ　いちろう）", ""),
    ("text", "  衆議院議員。 ", ""),
    ("text", "", ""),
    ("text", "岡山県選出。", ""),
    ("media", "", "https://www.shugiin.go.jp/profile/aisawa.jpg"))

  /** sangiin bill index: exact-match captions, 5-cell rows, meisai href in
    * the name cell (sangiin_spider.py:92-115). */
  val sangiinIndex: Document = doc("https://www.sangiin.go.jp/gian/204/gian.htm",
    ("title", "第204回国会 議案情報", ""),
    ("caption", "法律案（内閣提出）一覧", ""),
    ("row", "", ""), ("table_cell", "提出回次", ""), ("table_cell", "提出番号", ""),
    ("table_cell", "件名", ""), ("table_cell", "議決", ""), ("table_cell", "経過", ""),
    ("row", "", ""),
    ("table_cell", "204", ""), ("table_cell", "1", ""),
    ("table_cell", "犬法の一部を改正する法律案", "https://www.sangiin.go.jp/meisai/m20409001.htm"),
    ("table_cell", "可決", ""), ("table_cell", "", ""),
    ("caption", "法律案（参法）一覧", ""),
    ("row", "", ""), ("table_cell", "h", ""), ("table_cell", "h", ""),
    ("table_cell", "h", ""), ("table_cell", "h", ""), ("table_cell", "h", ""),
    ("row", "", ""),
    ("table_cell", "204", ""), ("table_cell", "9", ""),
    ("table_cell", "うさぎ保護法案", "https://www.sangiin.go.jp/meisai/m20410009.htm"),
    ("table_cell", "", ""), ("table_cell", "", ""),
    ("row", "", ""), // arity violation (4 cells) → quarantine
    ("table_cell", "204", ""), ("table_cell", "10", ""),
    ("table_cell", "ねこ法案", ""), ("table_cell", "", ""),
    ("caption", "決議案等", ""), // unmatched caption → whole table ignored
    ("row", "", ""), ("table_cell", "204", ""), ("table_cell", "1", ""),
    ("table_cell", "決議案", ""), ("table_cell", "", ""), ("table_cell", "", ""))

  /** sangiin meisai page: tables[1..6] = submission / sangiin committee /
    * sangiin plenary / shugiin committee / shugiin plenary / proclamation
    * (sangiin_spider.py:209-215). Gates exercised: sangiin committee 可決
    * (counts), sangiin plenary 修正 (counts), shugiin committee 継続審査
    * (date present but gated OFF), shugiin plenary 否決 (gated OFF),
    * proclamation absent. */
  val sangiinMeisai: Document = doc("https://www.sangiin.go.jp/meisai/m20410009.htm",
    ("caption", "本文情報", ""),
    ("row", "", ""), ("table_cell", "本文", ""), ("table_cell", "リンク", ""),
    ("caption", "提出法律案", ""),
    ("row", "", ""), ("table_cell", "提出日", ""), ("table_cell", "令和3年4月1日", ""),
    ("row", "", ""), ("table_cell", "先議区分", ""), ("table_cell", "本院先議", ""),
    ("row", "", ""), ("table_cell", "発議者", ""), ("table_cell", "逢沢一郎君　外二名", ""),
    ("caption", "参議院委員会等経過", ""),
    ("row", "", ""), ("table_cell", "付託委員会等", ""), ("table_cell", "内閣委員会", ""),
    ("row", "", ""), ("table_cell", "議決・継続結果", ""), ("table_cell", "可決", ""),
    ("row", "", ""), ("table_cell", "議決日", ""), ("table_cell", "令和3年4月10日", ""),
    ("caption", "参議院本会議経過", ""),
    ("row", "", ""), ("table_cell", "議決", ""), ("table_cell", "修正", ""),
    ("row", "", ""), ("table_cell", "議決日", ""), ("table_cell", "令和3年4月15日", ""),
    ("caption", "衆議院委員会等経過", ""),
    ("row", "", ""), ("table_cell", "付託委員会等", ""), ("table_cell", "", ""),
    ("row", "", ""), ("table_cell", "議決・継続結果", ""), ("table_cell", "継続審査", ""),
    ("row", "", ""), ("table_cell", "議決日", ""), ("table_cell", "令和3年5月1日", ""),
    ("caption", "衆議院本会議経過", ""),
    ("row", "", ""), ("table_cell", "議決", ""), ("table_cell", "否決", ""),
    ("row", "", ""), ("table_cell", "議決日", ""), ("table_cell", "令和3年5月2日", ""),
    ("caption", "公布", ""),
    ("row", "", ""), ("table_cell", "公布年月日", ""), ("table_cell", "", ""))

  val ministryPage: Document = doc("https://www.cao.go.jp/houan/204.html",
    ("caption", "法律案一覧", ""),
    ("row", "", ""), ("table_cell", "犬法の一部を改正する法律案", ""),
    ("table_cell", "概要（PDF）", "https://www.cao.go.jp/pdf/gaiyou1.pdf"),
    ("row", "", ""), ("table_cell", "猫法案", ""),
    ("table_cell", "新旧対照表", "https://www.cao.go.jp/pdf/sinkyu2.pdf"),
    ("row", "", ""), ("table_cell", "うさぎ法案", ""),
    ("table_cell", "本文リンク", "https://www.cao.go.jp/pdf/honbun3.pdf"))
}

class TransformsSpec extends AnyFunSuite {
  import Fixtures._

  test("ShugiinBills.parse: categories, bills, urls, follow-ups, quarantine") {
    val out = ShugiinBills.parse(shugiinIndex)
    assert(out.bills.map(_.bill_number) == Seq("204-閣-1", "204-閣-2", "204-衆-5"))
    assert(out.bills.head.name.contains("犬法の一部を改正する法律案"))
    assert(out.bills.head.category.contains("KAKUHOU"))
    assert(out.bills(2).category.contains("SHUHOU"))
    // bill 2 has no honbun link → only keika url
    assert(out.urls.count(_.title == "KEIKA") == 3)
    assert(out.urls.count(_.title == "HONBUN") == 2)
    // follow-ups carry bill_id meta and the right parse_fn
    val honbunFollows = out.follow.filter(_.parse_fn == "shugiin_honbun")
    assert(honbunFollows.length == 2)
    assert(honbunFollows.forall(_.meta.contains("bill_id")))
    // short row quarantined
    assert(out.quarantined.length == 1)
    // edges: url -> bill
    assert(out.edges.length == 5)
    assert(out.edges.forall(e => e.to_id.startsWith("Bill:")))
  }

  test("ShugiinBills.parseHouan: E17/E18 sectioning into body/supplement/reason") {
    val out = ShugiinBills.parseHouan(houanPage, Map("bill_id" -> "Bill:x"))
    val t = out.texts.head
    assert(t.body.contains("犬法の一部を次のように改正する。「芝犬」を「柴犬」に改める。"))
    assert(t.supplement.contains("この法律は、公布の日から施行する。"))
    assert(t.reason.contains("誤字を修正するため。"))
    assert(out.bills.head.reason.contains("誤字を修正するため。"))
    // out-of-order markers quarantine
    val bad = Fixtures.doc("x", ("text", "理 由", ""), ("text", "r", ""), ("text", "附 則", ""))
    assert(ShugiinBills.parseHouan(bad, Map()).quarantined.nonEmpty)
  }

  test("ShugiinBills.parseKeika: E8 group extraction from key-value table") {
    val out = ShugiinBills.parseKeika(keikaPage, Map("bill_id" -> "Bill:x"))
    assert(out.bills.head.supported_groups == Seq("JIMIN", "KOMEI"))
    assert(out.bills.head.opposed_groups == Seq("RIKKEN"))
  }

  test("Members.parseList: E20 name cleanup, group alias, detail follow-up") {
    val out = Members.parseList(memberList)
    val m = out.members.head
    assert(m.name == "逢沢一郎")
    assert(m.group.contains("JIMIN"))
    assert(m.house.contains("REPRESENTATIVES"))
    assert(out.follow.head.parse_fn == "member_detail")
    assert(out.urls.head.title == "GIIN_ZYOUHOU")
  }

  test("Members.parseDetail: E11 kana, E19 description, image") {
    val meta = Map("member_id" -> "Member:1", "member_name" -> "逢沢一郎")
    val out = Members.parseDetail(memberDetail, meta)
    val m = out.members.head
    assert(m.first_name.contains("一郎") && m.last_name.contains("逢沢"))
    assert(m.first_name_hira.contains("いちろう") && m.last_name_hira.contains("あいさわ"))
    assert(m.description.contains("衆議院議員。 岡山県選出。"))
    assert(m.image.contains("https://www.shugiin.go.jp/profile/aisawa.jpg"))
  }

  test("SangiinBills.parse: exact-caption dispatch, 5-cell rows, meisai follow-ups") {
    val out = SangiinBills.parse(sangiinIndex)
    assert(out.bills.map(_.bill_number) == Seq("204-閣-1", "204-参-9"))
    assert(out.bills.head.category.contains("KAKUHOU"))
    assert(out.bills(1).category.contains("SANHOU"))
    // GIAN_ZYOUHOU url from the name cell's href
    assert(out.urls.map(_.title).distinct == Seq("GIAN_ZYOUHOU"))
    assert(out.urls.forall(_.domain == "sangiin.go.jp"))
    assert(out.follow.map(_.parse_fn).distinct == Seq("sangiin_meisai"))
    assert(out.follow.forall(_.meta.contains("bill_id")))
    // 4-cell row quarantined; 決議案等 table ignored entirely
    assert(out.quarantined.length == 1)
    assert(!out.bills.exists(_.name.exists(_.contains("決議案"))))
  }

  test("SangiinBills.parseMeisai: R5 pivot, gated lifecycle dates, first house") {
    val m = SangiinBills.parseMeisai(sangiinMeisai, Map("bill_id" -> "Bill:u")).get
    def d(s: String) = Some(java.sql.Timestamp.valueOf(s + " 00:00:00"))
    assert(m.bill_id == "Bill:u")
    assert(m.submitted_date == d("2021-04-01")) // 令和3年 = 2021 (E27)
    // sangiin committee gate 可決 → date counts
    assert(m.passed_councilors_committee_date == d("2021-04-10"))
    // sangiin plenary gate 修正 → date counts
    assert(m.passed_councilors_date == d("2021-04-15"))
    // shugiin committee gate 継続審査 → date present but MUST NOT count
    assert(m.passed_representatives_committee_date.isEmpty)
    // shugiin plenary gate 否決 → gated off
    assert(m.passed_representatives_date.isEmpty)
    assert(m.proclaimed_date.isEmpty)
    // is_passed needs proclamation or both plenary passes
    assert(!m.is_passed)
    assert(m.first_house.contains("COUNCILORS"))
    // committee names: only the non-empty one, house-prefixed
    assert(m.committee_names == Seq("参議院内閣委員会"))
    assert(m.submitter_text.contains("逢沢一郎君　外二名"))
  }

  test("SangiinPipeline: R9 committee join, R8 submitter containment, activities") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val m = SangiinBills.parseMeisai(sangiinMeisai, Map("bill_id" -> "Bill:u")).get
    val committees = Seq(
      graft.model.Committee(ScrapeFns.committeeId("参議院内閣委員会"), "参議院内閣委員会", Some("COUNCILORS")),
      graft.model.Committee(ScrapeFns.committeeId("衆議院内閣委員会"), "衆議院内閣委員会", Some("REPRESENTATIVES")))
    val members = Seq(
      graft.model.Member(ScrapeFns.memberId("逢沢一郎"), "逢沢一郎"),
      graft.model.Member(ScrapeFns.memberId("蓮舫"), "蓮舫"))
    val out = SangiinPipeline.run(spark, spark.createDataset(Seq(m)),
      spark.createDataset(committees), spark.createDataset(members))
    val cEdges = out.billCommitteeEdges.collect().toSeq
    assert(cEdges == Seq(graft.model.Edge("Bill:u", ScrapeFns.committeeId("参議院内閣委員会"))))
    val mEdges = out.memberBillEdges.collect().toSeq
    assert(mEdges == Seq(graft.model.Edge(ScrapeFns.memberId("逢沢一郎"), "Bill:u")))
    val acts = out.activities.collect().toSeq
    assert(acts.length == 1)
    assert(acts.head.member_id == ScrapeFns.memberId("逢沢一郎"))
    assert(acts.head.bill_id.contains("Bill:u"))
    assert(acts.head.datetime == java.sql.Timestamp.valueOf("2021-04-01 00:00:00"))
  }

  test("MinistryBillUrls.parse: R4 link-text dispatch") {
    val p = MinistryBillUrls.Params("cao.go.jp", 0, 0, 1)
    val out = MinistryBillUrls.parse(ministryPage, p)
    assert(out == Seq(
      ("犬法の一部を改正する法律案", "GAIYOU_PDF", "https://www.cao.go.jp/pdf/gaiyou1.pdf"),
      ("猫法案", "SINKYU_PDF", "https://www.cao.go.jp/pdf/sinkyu2.pdf")))
  }

  test("R7: ministry triples join the bills dim exactly; misses quarantined") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val p = MinistryBillUrls.Params("cao.go.jp", 0, 0, 1)
    val triples = MinistryBillUrls.parse(ministryPage, p)
    val bills = Seq(
      graft.model.Bill("Bill:inu", "204-閣-1", Some("犬法の一部を改正する法律案"),
        Some("KAKUHOU"), Some(204)),
      graft.model.Bill("Bill:inu205", "205-閣-1", Some("犬法の一部を改正する法律案"),
        Some("KAKUHOU"), Some(205)), // same name, other diet — filtered out
      graft.model.Bill("Bill:neko", "204-衆-2", Some("猫法案"), Some("SHUHOU"), Some(204)))
    val (urls, edges, unmatched) = BillUrlJoin.attach(spark, triples.toDS(),
      bills.toDS(), "cao.go.jp", category = Some("KAKUHOU"), dietNumber = Some(204))
    val u = urls.collect()
    assert(u.length == 1 && u.head.to_id == "Bill:inu" && u.head.title == "GAIYOU_PDF")
    assert(edges.collect().toSeq == Seq(graft.model.Edge(u.head.id, "Bill:inu")))
    // 猫法案 is SHUHOU → filtered by the category gate → unmatched
    assert(unmatched.collect().toSeq == Seq("猫法案"))
  }

  test("R17: diet lookup — exact by number, latest otherwise") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    def ts(y: Int) = java.sql.Timestamp.valueOf(s"$y-01-01 00:00:00")
    val diets = spark.createDataset(Seq(
      graft.model.Diet("Diet:203", 203, ts(2020)),
      graft.model.Diet("Diet:205", 205, ts(2021)),
      graft.model.Diet("Diet:204", 204, ts(2021))))
    assert(Diets.getDiet(spark, diets, Some(204)).map(_.id).contains("Diet:204"))
    assert(Diets.getDiet(spark, diets, None).map(_.number).contains(205))
    assert(Diets.getDiet(spark, diets, Some(999)).isEmpty)
  }

  test("manual committees: static rows with deterministic ids") {
    val cs = ManualCommittees.committees
    assert(cs.map(_.name) == Seq("衆議院本会議", "参議院本会議", "衆議院憲法審査会",
      "衆議院情報監視審査会", "衆議院政治倫理審査会"))
    assert(cs.head.num_members.contains(465))
    assert(cs(1).num_members.contains(248))
    assert(cs.map(_.id).distinct.length == 5)
  }

  test("span-sequence equality: fixture round-trips through the table grouping") {
    // per-row oracle invariant (kind, text, media_ref, order): the grouping
    // must be a pure view — the document spans are untouched
    val spans = shugiinIndex.spans
    assert(spans == spans.sortBy(_.offset))
    val cells = SpanTables.tables(shugiinIndex).flatMap(_.rows).flatten
    assert(cells.length == spans.count(_.kind == "table_cell"))
  }
}
