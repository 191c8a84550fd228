package graft.extract

import graft.model.BillAction
import org.apache.spark.sql.{Dataset, SparkSession}

/** One speech record entering the bill-action state machine. */
final case class SpeechRec(minutes_id: String, speech_order: Int, speaker: String, speech: String)

/** Per-minutes context the machine needs (topics + the bill dimension). */
final case class MinutesCtx(minutes_id: String, topics: Seq[String], topic_ids: Seq[String])

/**
 * R19 — the bill-action state machine: the engine's one genuinely stateful
 * ordered operator. Scans moderator speeches of a meeting in speechOrder;
 * a speech naming a topic updates `currentTopicIds`; action keywords emit
 * (bill, minutes, type, speech) at most once per (bill, type).
 *
 * Reference: /root/reference/crawler/spiders/minutes_spider.py:177-205;
 * behavior pinned by tests/spiders/test_minutes_spider.py:9-48 (10-speech
 * script → exactly 4 actions).
 *
 * Spark-first: per-group sequential scan via `groupByKey(minutes_id)
 * .flatMapGroups` with an in-memory sort by speech_order — groups are
 * single meetings (couple hundred speeches), so the sort is tiny; the
 * *distribution* is by minutes_id, which is the natural parallelism unit.
 */
object BillActions {

  /** `politylink.utils.bill.extract_bill_action_types` is an external lib;
    * our own spec, pinned by the reference test: phrase patterns that mark
    * the *start/occurrence* of an action (so 「趣旨説明は既に聴取…」 does NOT
    * fire BILL_EXPLANATION while 「質疑に入ります」 fires QUESTION). */
  def extractBillActionTypes(speech: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val explanation = Seq("趣旨説明お願い", "趣旨説明を聴取", "趣旨の説明を聴取", "趣旨説明を求め", "趣旨の説明を求め", "提案理由の説明を聴取")
    val question = Seq("質疑に入り", "質疑を行い", "質疑を終わ", "質疑はありませんか")
    val vote = Seq("採決に入り", "採決いたします", "採決をいたします", "採決を行い")
    if (explanation.exists(speech.contains)) out += "BILL_EXPLANATION"
    if (question.exists(speech.contains)) out += "QUESTION"
    if (vote.exists(speech.contains)) out += "VOTE"
    out.toSeq
  }

  /** Pure per-meeting scan — directly mirrors the reference loop. `recs`
    * must already be the moderator speeches (reference filters them at
    * minutes_spider.py:151-152); they are sorted here by speech_order. */
  def scanMeeting(
      ctx: MinutesCtx,
      recs: Seq[SpeechRec],
      billIdToName: Seq[(String, String)]): Seq[BillAction] = {
    val billMap = billIdToName.filter { case (id, _) => ctx.topic_ids.contains(id) }
    val matchables = ctx.topics ++ billMap.map(_._2)

    var currentTopicIds: Seq[String] = Nil
    val prevTypes = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    val out = scala.collection.mutable.ArrayBuffer[BillAction]()

    for (rec <- recs.sortBy(_.speech_order)) {
      if (matchables.exists(rec.speech.contains))
        currentTopicIds = Topics.extractTopicIds(rec.speech, billMap)
      val actionTypes = extractBillActionTypes(rec.speech)
      if (currentTopicIds.nonEmpty && actionTypes.nonEmpty) {
        for (topicId <- currentTopicIds; at <- actionTypes) {
          if (!prevTypes(topicId).contains(at)) {
            out += BillAction(
              id = ScrapeFns.billActionId(topicId, ctx.minutes_id, at),
              bill_id = topicId,
              minutes_id = ctx.minutes_id,
              speech_id = ScrapeFns.speechId(ctx.minutes_id, rec.speech_order),
              bill_action_type = at)
            prevTypes(topicId) = prevTypes(topicId) + at
          }
        }
      }
    }
    out.toSeq
  }

  /** Distributed form: speeches cogrouped with their meeting contexts on
    * minutes_id — both sides shuffle once on the meeting key and the scan
    * runs where the group lives. Contexts are a Dataset (one row per
    * meeting), NEVER collected to the driver: at full-corpus scale (every
    * kokkai meeting ever) a driver-side context map is an OOM. */
  def run(
      spark: SparkSession,
      speeches: Dataset[SpeechRec],
      contexts: Dataset[MinutesCtx],
      billIdToName: Seq[(String, String)]): Dataset[BillAction] = {
    import spark.implicits._
    val billsB = spark.sparkContext.broadcast(billIdToName)
    speeches
      .filter(r => ScrapeFns.isModerator(r.speech))
      .groupByKey(_.minutes_id)
      .cogroup(contexts.groupByKey(_.minutes_id)) { (_, sIt, cIt) =>
        cIt.nextOption() match {
          case Some(ctx) => scanMeeting(ctx, sIt.toSeq, billsB.value).iterator
          case None => Iterator.empty
        }
      }
  }

  /** Convenience overload for driver-resident contexts (tests, q33). */
  def run(
      spark: SparkSession,
      speeches: Dataset[SpeechRec],
      contexts: Seq[MinutesCtx],
      billIdToName: Seq[(String, String)]): Dataset[BillAction] = {
    import spark.implicits._
    run(spark, speeches, spark.createDataset(contexts), billIdToName)
  }
}
