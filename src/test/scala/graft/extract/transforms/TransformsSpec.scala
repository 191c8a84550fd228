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

  test("MinistryBillUrls.parse: R4 link-text dispatch") {
    val p = MinistryBillUrls.Params("cao.go.jp", 0, 0, 1)
    val out = MinistryBillUrls.parse(ministryPage, p)
    assert(out == Seq(
      ("犬法の一部を改正する法律案", "GAIYOU_PDF", "https://www.cao.go.jp/pdf/gaiyou1.pdf"),
      ("猫法案", "SINKYU_PDF", "https://www.cao.go.jp/pdf/sinkyu2.pdf")))
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
