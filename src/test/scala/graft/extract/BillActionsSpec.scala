package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** R19 golden — ported 1:1 from
  * /root/reference/tests/spiders/test_minutes_spider.py:9-48. */
class BillActionsSpec extends AnyFunSuite {

  test("scrape_bill_actions 10-speech script emits exactly 4 actions") {
    val speeches = Seq(
      "これより会議を始めます",
      "法律案Aと法律案Bを一括して議題とします",
      "趣旨説明は既に聴取しておりますので、質疑に入ります", // 2
      "法律案Aと法律案Bの質疑を終わります",
      "法律案Cを議題とします",
      "採決に入ります",
      "法律案Dを議題とします",
      "趣旨説明お願いします", // 7
      "採決に入ります", // 8
      "お疲れ様でした")
    val mid = ScrapeFns.minutesId("猫ちゃん会議", "2021-01-01T00:00")
    val recs = speeches.zipWithIndex.map { case (s, i) => SpeechRec(mid, i, "議長", s) }
    val ctx = MinutesCtx(mid,
      topics = Seq("法律案A", "法律案B", "法律案C", "法律案D"),
      topic_ids = Seq("Bill:A", "Bill:B", "Bill:D"))
    val billIdToName = Seq("Bill:A" -> "法律案A", "Bill:B" -> "法律案B", "Bill:D" -> "法律案D")

    val actions = BillActions.scanMeeting(ctx, recs, billIdToName)
    assert(actions.length == 4)

    def check(i: Int, billId: String, order: Int, tpe: String): Unit = {
      assert(actions(i).bill_id == billId)
      assert(actions(i).minutes_id == mid)
      assert(actions(i).speech_id == ScrapeFns.speechId(mid, order))
      assert(actions(i).bill_action_type == tpe)
    }
    check(0, "Bill:A", 2, "QUESTION")
    check(1, "Bill:B", 2, "QUESTION")
    check(2, "Bill:D", 7, "BILL_EXPLANATION")
    check(3, "Bill:D", 8, "VOTE")
  }
}
