package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests ported 1:1 from /root/reference/tests/utils/test_topics.py
  * (the 4 transcripts are real kokkai minutes; source URLs in the
  * reference test comments). The transcript strings reproduce the Python
  * triple-quoted literals exactly, including the 4-space source indent. */
class TopicsSpec extends AnyFunSuite {

  test("clean_topic") {
    assert(Topics.cleanTopic("日程第一　法律案") == "法律案")
    assert(Topics.cleanTopic("法律案") == "法律案")
    assert(Topics.cleanTopic("一、 法律案") == "法律案")
    assert(Topics.cleanTopic("○法律案") == "法律案")
  }

  test("split_topic") {
    assert(Topics.splitTopic("法律案") == Seq("法律案"))
    assert(Topics.splitTopic("法律案1（内閣提出）、法律案2（内閣提出）") == Seq("法律案1（内閣提出）", "法律案2（内閣提出）"))
    assert(Topics.splitTopic("法律案1（内閣提出）及び法律案2（内閣提出）") == Seq("法律案1（内閣提出）", "法律案2（内閣提出）"))
    assert(Topics.splitTopic("委員会1、委員会2") == Seq("委員会1、委員会2"))
    assert(Topics.splitTopic("法律案（内閣提出、1号）") == Seq("法律案（内閣提出、1号）"))
    assert(Topics.splitTopic("犬及び猫に関する法律案（内閣提出）") == Seq("犬及び猫に関する法律案（内閣提出）"))
  }

  test("extract_topics 1 — shugiin plenary, split and no-split") {
    // https://kokkai.ndl.go.jp/#/detail?minId=120405254X01120210309
    val firstSpeech = Seq(
      "",
      "    （省略）",
      "    　　　　―――――――――――――",
      "    　議事日程　第五号",
      "    　　令和三年三月九日",
      "    　　　　午後一時開議",
      "    　第一　原子力発電施設等立地地域の振興に関する特別措置法の一部を改正する法律案（内閣提出）",
      "    　　　　―――――――――――――",
      "    ○本日の会議に付した案件",
      "    　日程第一　原子力発電施設等立地地域の振興に関する特別措置法の一部を改正する法律案（内閣提出）",
      "    　デジタル社会形成基本法案（内閣提出）、デジタル庁設置法案（内閣提出）、デジタル社会の形成を図るための関係法律の整備に関する法律案（内閣提出）、公的給付の支給等の迅速かつ確実な実施のための預貯金口座の登録等に関する法律案（内閣提出）及び預貯金者の意思に基づく個人番号の利用による預貯金口座の管理等に関する法律案（内閣提出）の趣旨説明及び質疑",
      "    　　　　午後一時二分開議",
      "    ").mkString("\n")

    val expected = Seq(
      "原子力発電施設等立地地域の振興に関する特別措置法の一部を改正する法律案（内閣提出）",
      "デジタル社会形成基本法案（内閣提出）",
      "デジタル庁設置法案（内閣提出）",
      "デジタル社会の形成を図るための関係法律の整備に関する法律案（内閣提出）",
      "公的給付の支給等の迅速かつ確実な実施のための預貯金口座の登録等に関する法律案（内閣提出）",
      "預貯金者の意思に基づく個人番号の利用による預貯金口座の管理等に関する法律案（内閣提出）の趣旨説明及び質疑")
    assert(Topics.extractTopics(firstSpeech) == expected)

    val expectedNoSplit = Seq(
      "原子力発電施設等立地地域の振興に関する特別措置法の一部を改正する法律案（内閣提出）",
      "デジタル社会形成基本法案（内閣提出）、デジタル庁設置法案（内閣提出）、デジタル社会の形成を図るための関係法律の整備に関する法律案（内閣提出）、公的給付の支給等の迅速かつ確実な実施のための預貯金口座の登録等に関する法律案（内閣提出）及び預貯金者の意思に基づく個人番号の利用による預貯金口座の管理等に関する法律案（内閣提出）の趣旨説明及び質疑")
    assert(Topics.extractTopics(firstSpeech, split = false) == expectedNoSplit)
  }

  test("extract_topics 2 — committee with long bill names") {
    // https://kokkai.ndl.go.jp/#/detail?minId=120304183X00320201126
    val firstSpeech = Seq(
      "",
      "    （省略）",
      "    　　　　―――――――――――――",
      "    本日の会議に付した案件",
      "    　日本国憲法の改正手続に関する法律の一部を改正する法律案（逢沢一郎君外五名提出、第百九十六回国会衆法第四二号）",
      "    　日本国憲法及び日本国憲法に密接に関連する基本法制に関する件（日本国憲法及び憲法改正国民投票法を巡る諸問題）",
      "    　　　　　――――◇―――――",
      "        ").mkString("\n")

    val expected = Seq(
      "日本国憲法の改正手続に関する法律の一部を改正する法律案（逢沢一郎君外五名提出、第百九十六回国会衆法第四二号）",
      "日本国憲法及び日本国憲法に密接に関連する基本法制に関する件（日本国憲法及び憲法改正国民投票法を巡る諸問題）")
    assert(Topics.extractTopics(firstSpeech) == expected)
  }

  test("extract_topics 3 — multiple flat topics") {
    // https://kokkai.ndl.go.jp/#/detail?minId=120104577X00320200601
    val firstSpeech = Seq(
      "",
      "    （省略）",
      "    　　　　―――――――――――――",
      "    本日の会議に付した案件",
      "    　政府参考人出頭要求に関する件",
      "    　公職選挙法の一部を改正する法律案（逢沢一郎君外九名提出、衆法第一六号）",
      "    　政治倫理の確立及び公職選挙法改正に関する件",
      "    　　　　　――――◇―――――",
      "    ").mkString("\n")

    val expected = Seq(
      "政府参考人出頭要求に関する件",
      "公職選挙法の一部を改正する法律案（逢沢一郎君外九名提出、衆法第一六号）",
      "政治倫理の確立及び公職選挙法改正に関する件")
    assert(Topics.extractTopics(firstSpeech) == expected)
  }

  test("extract_topics 4 — sangiin with wrapped lines (indent fold)") {
    // https://kokkai.ndl.go.jp/#/detail?minId=120115254X01920200527
    val firstSpeech = Seq(
      "",
      "    （省略）",
      "    　　　　━━━━━━━━━━━━━",
      "    ○議事日程　第十九号",
      "    　　令和二年五月二十七日",
      "    　　　午前十時開議",
      "    　第一　所得に対する租税に関する二重課税の除",
      "    　　去並びに脱税及び租税回避の防止のための日",
      "    　　本国とアルゼンチン共和国との間の条約の締",
      "    　　結について承認を求めるの件（衆議院送付）",
      "    　第二　所得に対する租税に関する二重課税の除",
      "    　　去並びに脱税及び租税回避の防止のための日",
      "    　　本国とウルグアイ東方共和国との間の条約の",
      "    　　締結について承認を求めるの件（衆議院送付",
      "    　　）",
      "    　　　　━━━━━━━━━━━━━",
      "    ○本日の会議に付した案件",
      "    　一、復興庁設置法等の一部を改正する法律案（",
      "    　　趣旨説明）",
      "    　以下　議事日程のとおり",
      "    　　　　　─────・─────",
      "    ").mkString("\n")

    val expected = Seq(
      "所得に対する租税に関する二重課税の除去並びに脱税及び租税回避の防止のための日本国とアルゼンチン共和国との間の条約の締結について承認を求めるの件（衆議院送付）",
      "所得に対する租税に関する二重課税の除去並びに脱税及び租税回避の防止のための日本国とウルグアイ東方共和国との間の条約の締結について承認を求めるの件（衆議院送付）",
      "復興庁設置法等の一部を改正する法律案（趣旨説明）")
    assert(Topics.extractTopics(firstSpeech) == expected)
  }

  test("clean_committee_topic strips trailing ため") {
    assert(Topics.cleanCommitteeTopic("国政を調査するため") == "国政を調査する")
    assert(Topics.cleanCommitteeTopic("国政調査") == "国政調査")
  }

  test("extract_topic_ids — substring containment in map order") {
    val bills = Seq("Bill:A" -> "法律案A", "Bill:B" -> "法律案B")
    assert(Topics.extractTopicIds("法律案Aと法律案Bを一括して議題とします", bills) == Seq("Bill:A", "Bill:B"))
    assert(Topics.extractTopicIds("法律案Cを議題とします", bills) == Nil)
  }
}
