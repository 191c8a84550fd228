package graft.extract.transforms

import graft.SparkTestSession
import graft.extract.ScrapeFns
import graft.model.{Document, Span}
import org.scalatest.funsuite.AnyFunSuite

class MinutesPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def apiDoc(id: String, json: String): Document =
    Document(id, Seq(Span("json", json, "", 0)))

  // a kokkai API page (FIXTURES.md `kokkai_meeting_api`): speechRecord[0]
  // is 会議録情報 carrying the topic section
  private val firstSpeech =
    "本日の会議に付した案件\\n　犬法の一部を改正する法律案（内閣提出）\\n　猫法案（内閣提出）\\n　　　　――――◇―――――"
  private val body =
    s"""{"meetingRecord": [
       |  {"issueID": "iss1", "nameOfHouse": "衆議院", "nameOfMeeting": "法務委員会",
       |   "date": "2021-03-09", "meetingURL": "https://kokkai.ndl.go.jp/m1",
       |   "speechRecord": [
       |     {"speechOrder": 0, "speaker": "会議録情報", "speech": "$firstSpeech", "speechURL": "https://kokkai.ndl.go.jp/s0"},
       |     {"speechOrder": 1, "speaker": "猫山委員長", "speech": "○猫山委員長　犬法の一部を改正する法律案（内閣提出）を議題とします。質疑に入ります", "speechURL": "https://kokkai.ndl.go.jp/s1"},
       |     {"speechOrder": 2, "speaker": "逢沢一郎", "speech": "○逢沢一郎君　質問です が", "speechURL": "https://kokkai.ndl.go.jp/s2"},
       |     {"speechOrder": 3, "speaker": "猫山委員長", "speech": "○猫山委員長　採決に入ります", "speechURL": "https://kokkai.ndl.go.jp/s3"}
       |   ]}],
       | "nextRecordPosition": 6}""".stripMargin

  test("kokkai API page → minutes, speeches, texts, activities, bill actions") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(apiDoc("page1", body)))
    val bills = Seq("Bill:dog" -> "犬法の一部を改正する法律案")
    val members = Seq("逢沢一郎" -> "Member:aisawa")
    val out = MinutesPipeline.run(spark, docs, bills, members)

    val m = out.minutes.collect().head
    assert(m.name == "衆議院法務委員会")
    assert(m.topics == Seq("犬法の一部を改正する法律案（内閣提出）", "猫法案（内閣提出）"))
    assert(m.topic_ids == Seq("Bill:dog"))
    assert(m.speakers == Seq("猫山委員長", "逢沢一郎"))
    assert(m.speaker_ids == Seq("Member:aisawa"))
    assert(m.ndl_min_id.contains("iss1"))

    val speeches = out.speeches.collect().sortBy(_.order_in_minutes)
    assert(speeches.length == 3) // record 0 skipped
    assert(speeches(1).member_id.contains("Member:aisawa"))
    assert(speeches(0).id == ScrapeFns.speechId(m.id, 1))

    // R13: ordered concat of cleaned speeches
    val mt = out.minutesTexts.collect().head
    assert(mt.body.contains(
      "犬法の一部を改正する法律案（内閣提出）を議題とします。質疑に入ります" +
        "質問ですが" + "採決に入ります"))

    // R12: one activity per member speaker
    val acts = out.activities.collect()
    assert(acts.length == 1)
    assert(acts.head.member_id == "Member:aisawa")
    assert(acts.head.minutes_id.contains(m.id))

    // R19: moderator sets topic at order 1 (QUESTION) then VOTE at order 3
    val actions = out.billActions.collect().sortBy(_.bill_action_type)
    assert(actions.map(a => (a.bill_id, a.bill_action_type)).toSeq ==
      Seq(("Bill:dog", "QUESTION"), ("Bill:dog", "VOTE")))
    assert(actions.find(_.bill_action_type == "VOTE").get.speech_id ==
      ScrapeFns.speechId(m.id, 3))

    // S5 cursor
    assert(out.nextPositions.collect().head._2.contains(6L))

    // R26 default-off: no keyphrases unless opted in (minutes_spider.py:29)
    assert(acts.head.keyphrases.isEmpty)
  }

  test("R26 opt-in: activities carry top-3 keyphrases of the joined speech") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(apiDoc("page1", body)))
    val out = MinutesPipeline.run(spark, docs,
      bills = Seq("Bill:dog" -> "犬法の一部を改正する法律案"),
      members = Seq("逢沢一郎" -> "Member:aisawa"),
      collectKeyphrases = true)
    val acts = out.activities.collect()
    assert(acts.length == 1)
    // the member's raw speech is "○逢沢一郎君　質問です が"
    assert(acts.head.keyphrases ==
      graft.extract.Keyphrases.extract("○逢沢一郎君　質問です が", 3))
    assert(acts.head.keyphrases.nonEmpty)
  }
}
