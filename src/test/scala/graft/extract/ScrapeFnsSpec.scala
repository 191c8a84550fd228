package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Golden tests ported 1:1 from the reference
  * (/root/reference/tests/utils/test_common.py, test_scrape.py,
  * test_elasticsearch.py, tests/spiders/test_shugiin_minutes_spider.py). */
class ScrapeFnsSpec extends AnyFunSuite {

  test("clean_speech drops the speaker prefix and all whitespace joins") {
    val speech = "○議長（大島理森君）　各請願は委員長の報告を省略して採択するに御異議ありませんか。 　　　　〔「異議なし」と呼ぶ者あり〕"
    val expected = "各請願は委員長の報告を省略して採択するに御異議ありませんか。〔「異議なし」と呼ぶ者あり〕"
    assert(ScrapeFns.cleanSpeech(speech) == expected)
  }

  test("parse_name_str both forms") {
    assert(ScrapeFns.parseNameStr("逢沢　一郎（あいさわ　いちろう）").contains(("一郎", "逢沢", "いちろう", "あいさわ")))
    assert(ScrapeFns.parseNameStr("蓮舫（れんほう）").contains(("蓮舫", "", "れんほう", "")))
    assert(ScrapeFns.parseNameStr("かっこなし").isEmpty)
  }

  test("extract_datetime") {
    assert(ScrapeFns.extractDatetime("2021年7月7日").contains(LocalDateTime.of(2021, 7, 7, 0, 0)))
    assert(ScrapeFns.extractDatetime("\t2021年7月7日(水)   ").contains(LocalDateTime.of(2021, 7, 7, 0, 0)))
    assert(ScrapeFns.extractDatetime("ワンワン").isEmpty)
  }

  test("extract_parliamentary_group_or_none") {
    assert(ScrapeFns.extractParliamentaryGroupOrNone("自民").contains("JIMIN"))
    assert(ScrapeFns.extractParliamentaryGroupOrNone("自由民主党・無所属の会").contains("JIMIN"))
    assert(ScrapeFns.extractParliamentaryGroupOrNone("立民").contains("RIKKEN"))
    assert(ScrapeFns.extractParliamentaryGroupOrNone("立憲民主党・無所属").contains("RIKKEN"))
    assert(ScrapeFns.extractParliamentaryGroupOrNone("ウサイン・ボルト").isEmpty)
  }

  test("extract_parliamentary_groups") {
    assert(ScrapeFns.extractParliamentaryGroups("") == Nil)
    assert(ScrapeFns.extractParliamentaryGroups(
      "自由民主党・無所属の会; 公明党; 日本維新の会・無所属の会; 国民民主党・無所属クラブ") ==
      Seq("JIMIN", "KOMEI", "ISHIN", "KOKUMIN"))
  }

  test("build_bill_text sections at 附 則 / 理 由") {
    val texts = Seq(
      "犬法の一部を次のように改正する。",
      "「芝犬」を「柴犬」に改める。",
      "附 則",
      "この法律は、別に法律で定める日から施行する。",
      "理 由",
      "誤字を修正するため。")
    val Some((body, supplement, reason)) = ScrapeFns.buildBillText(texts)
    assert(body == "犬法の一部を次のように改正する。「芝犬」を「柴犬」に改める。")
    assert(supplement == "この法律は、別に法律で定める日から施行する。")
    assert(reason == "誤字を修正するため。")
  }

  test("build_bill_text missing markers fails") {
    assert(ScrapeFns.buildBillText(Seq("法律案は附則と理由を含む必要がある")).isEmpty)
  }

  test("extract_datetime_from_title") {
    assert(ScrapeFns.extractDatetimeFromTitle("第201回国会8月26日内閣委員会ニュース", 2020)
      .contains(LocalDateTime.of(2020, 8, 26, 0, 0)))
    assert(ScrapeFns.extractDatetimeFromTitle("ネコちゃんニュース", 2020).isEmpty)
  }

  test("is_moderator") {
    assert(ScrapeFns.isModerator("○議長（大島理森君）　各請願は…"))
    assert(ScrapeFns.isModerator("○委員長（猫山猫太郎君）　質疑に入ります"))
    assert(!ScrapeFns.isModerator("○大島理森君　発言します"))
  }

  test("japanese era dates (E27 DateConverter pin)") {
    assert(ScrapeFns.convertJapaneseDate("令和3年4月1日").contains(LocalDateTime.of(2021, 4, 1, 0, 0)))
    assert(ScrapeFns.convertJapaneseDate("令和元年5月1日").contains(LocalDateTime.of(2019, 5, 1, 0, 0)))
    assert(ScrapeFns.convertJapaneseDate("平成31年1月1日").contains(LocalDateTime.of(2019, 1, 1, 0, 0)))
    assert(ScrapeFns.convertJapaneseDate("2021年4月1日").contains(LocalDateTime.of(2021, 4, 1, 0, 0)))
  }

  test("idgen is deterministic and key-sensitive") {
    assert(ScrapeFns.speechId("Minutes:x", 3) == ScrapeFns.speechId("Minutes:x", 3))
    assert(ScrapeFns.speechId("Minutes:x", 3) != ScrapeFns.speechId("Minutes:x", 4))
    assert(ScrapeFns.billId("204-衆-1") startsWith "Bill:")
  }

  test("whitespace normalizers handle U+3000") {
    assert(ScrapeFns.squeezeWhitespace(" 委員数　：　10人 ") == "委員数：10人")
    assert(ScrapeFns.normalizeWhitespace("a　b  c") == "a b c")
  }
}
