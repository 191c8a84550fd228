package graft.extract.transforms

import graft.extract.{BillActions, MinutesCtx, ScrapeFns, SpeechRec, Topics}
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The kokkai meeting-API pipeline — the reference's heaviest dataflow
 * (SURVEY.md §3.2; /root/reference/crawler/spiders/minutes_spider.py).
 *
 * One fetched page = one JSON body with up to 5 meetings
 * (`maximumRecords=5`, minutes_spider.py:38). Spark-first shape:
 * `from_json` into the typed meeting schema, `explode` to speeches, then
 *  - Minutes entities with topics from the first speech (E12 fold),
 *  - Speech + SpeechText per record (clean via E9),
 *  - per-speaker Activities via ordered grouped concat (R12),
 *  - MinutesText via ordered full-text concat (R13),
 *  - bill actions via the R19 state machine (flatMapGroups),
 *  - speaker→member and topic→bill broadcast lookup joins (R6/R8).
 */
object MinutesPipeline {

  val meetingSchema: DataType = ArrayType(StructType(Seq(
    StructField("issueID", StringType),
    StructField("nameOfHouse", StringType),
    StructField("nameOfMeeting", StringType),
    StructField("date", StringType),
    StructField("meetingURL", StringType),
    StructField("speechRecord", ArrayType(StructType(Seq(
      StructField("speechOrder", IntegerType),
      StructField("speaker", StringType),
      StructField("speech", StringType),
      StructField("speechURL", StringType))))))))

  val bodySchema: DataType = StructType(Seq(
    StructField("meetingRecord", meetingSchema),
    StructField("nextRecordPosition", LongType)))

  final case class Out(
      minutes: Dataset[Minutes],
      speeches: Dataset[Speech],
      speechTexts: Dataset[DocText],
      minutesTexts: Dataset[DocText],
      activities: Dataset[Activity],
      billActions: Dataset[BillAction],
      nextPositions: Dataset[(String, Option[Long])])

  def run(
      spark: SparkSession,
      docs: Dataset[Document],
      bills: Seq[(String, String)], // (bill_id, name) dim — broadcast (R11)
      members: Seq[(String, String)], // (name, member_id) dim — broadcast (R8)
      collectKeyphrases: Boolean = false // R26 opt-in (minutes_spider.py:29)
      ): Out = {
    import spark.implicits._

    val bodies = docs.map(d => (d.doc_id, SpanTables.jsonBody(d).getOrElse("")))
      .toDF("doc_id", "body")
      .withColumn("parsed", from_json($"body", bodySchema))
      .cache()

    val nextPositions = bodies
      .select($"doc_id", $"parsed.nextRecordPosition".as("next_pos"))
      .as[(String, Option[Long])]

    val meetings = bodies
      .select($"doc_id", explode($"parsed.meetingRecord").as("m"))
      .select($"doc_id", $"m.issueID".as("issue_id"),
        concat($"m.nameOfHouse", $"m.nameOfMeeting").as("name"),
        $"m.date".as("date"), $"m.meetingURL".as("meeting_url"),
        $"m.speechRecord".as("recs"))
      .filter($"name".isNotNull && $"date".isNotNull && size($"recs") > 0)
      .cache()

    val membersB = spark.sparkContext.broadcast(members.toMap)

    // Minutes entity: topics from the first speech (= 会議録情報, E12);
    // topic ids filled below via the R6/E16 containment join.
    val minutesBase = meetings.map { row =>
      val name = row.getAs[String]("name")
      val date = row.getAs[String]("date")
      val recs = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("recs"))
      val firstSpeech = recs.headOption.map(_.getAs[String]("speech")).getOrElse("")
      val topics = Topics.extractTopics(firstSpeech)
      val speakers = ScrapeFns.deduplicate(recs.drop(1).map(_.getAs[String]("speaker")))
      Minutes(
        // CROSS-FAMILY ID CONTRACT: every producer/consumer of a minutes
        // id (TV pages, vrsdd gate, shugiin minutes-news gate — all via
        // "yyyy-MM-dd 00:00:00") must build it from the same datetime
        // string, or the K4 existence gates can never match API-built
        // minutes. The raw API `date` here is date-only; canonicalize.
        id = ScrapeFns.minutesId(name, date + " 00:00:00"),
        name = name,
        start_date_time = java.sql.Timestamp.valueOf(date + " 00:00:00"),
        ndl_min_id = Option(row.getAs[String]("issue_id")),
        ndl_url = Option(row.getAs[String]("meeting_url")),
        topics = topics,
        topic_ids = Nil,
        speakers = speakers,
        speaker_ids = speakers.flatMap(membersB.value.get))
    }.cache()

    // R6/E16 — topic→bill containment lookup as a declarative broadcast
    // join (the SangiinPipeline R8 shape — SangiinPipeline.scala:48-53):
    // posexplode topics, broadcast nested-loop join on two-way
    // containment, keep the FIRST matching bill in dim order per topic
    // (the reference's collectFirst semantics, via min_by on the dim
    // index), then order-preserving dedup of ids in topic order. No
    // per-topic linear scan over a driver-collected Seq.
    val billDim = bills.zipWithIndex
      .map { case ((id, bn), i) => (id, bn, i) }
      .toDF("bill_id", "bn", "bidx")
    val topicIdsById = minutesBase
      .select($"id", posexplode($"topics").as(Seq("tpos", "topic")))
      .join(broadcast(billDim),
        instr($"topic", $"bn") > 0 || instr($"bn", $"topic") > 0)
      .groupBy($"id", $"tpos")
      .agg(min_by($"bill_id", $"bidx").as("bill_id"))
      .groupBy($"id")
      .agg(transform(array_sort(collect_list(struct($"tpos", $"bill_id"))),
        x => x.getField("bill_id")).as("tids"))
      .select($"id".as("_1"), $"tids".as("_2"))
      .as[(String, Seq[String])]

    val minutes = minutesBase
      .joinWith(topicIdsById, minutesBase("id") === topicIdsById("_1"), "left_outer")
      .map { case (m, hit) =>
        m.copy(topic_ids = ScrapeFns.deduplicate(Option(hit).map(_._2).getOrElse(Nil)))
      }
      .cache()

    // explode speeches (skip record 0 = 会議録情報)
    val speechRows = meetings.flatMap { row =>
      val name = row.getAs[String]("name")
      val date = row.getAs[String]("date")
      val mid = ScrapeFns.minutesId(name, date + " 00:00:00") // see id contract above
      val recs = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("recs"))
      recs.drop(1).map { r =>
        val speech = r.getAs[String]("speech")
        (mid, name, date, r.getAs[Int]("speechOrder"), r.getAs[String]("speaker"),
          speech, ScrapeFns.cleanSpeech(speech), r.getAs[String]("speechURL"))
      }
    }.toDF("minutes_id", "minutes_name", "date", "speech_order", "speaker",
        "speech", "cleaned", "speech_url")
      .cache()

    val speeches = speechRows.map { r =>
      val mid = r.getAs[String]("minutes_id")
      val order = r.getAs[Int]("speech_order")
      val speaker = r.getAs[String]("speaker")
      Speech(ScrapeFns.speechId(mid, order), mid, order, Some(speaker),
        member_id = membersB.value.get(speaker),
        ndl_url = Option(r.getAs[String]("speech_url")))
    }

    val speechTexts = speechRows.map { r =>
      val mid = r.getAs[String]("minutes_id")
      val order = r.getAs[Int]("speech_order")
      DocText(ScrapeFns.speechId(mid, order), "speech",
        title = Option(r.getAs[String]("minutes_name")),
        speaker = Option(r.getAs[String]("speaker")),
        body = Some(r.getAs[String]("cleaned")),
        date = Option(r.getAs[String]("date")))
    }

    // R13 — per-meeting full text: ordered concat of cleaned speeches
    val minutesTexts = speechRows
      .groupBy($"minutes_id", $"minutes_name", $"date")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct($"speech_order", $"cleaned"))),
        x => x.getField("cleaned"))).as("joined"))
      .map { r =>
        val cleaned = r.getAs[String]("joined")
        DocText(r.getAs[String]("minutes_id"), "minutes",
          title = Option(r.getAs[String]("minutes_name")),
          body = Some(cleaned), date = Option(r.getAs[String]("date")))
      }

    // R12 — per-(meeting, speaker) Activities for member speakers, with
    // the first speech URL by order. Opt-in R26: the speaker's speeches
    // joined in order (the reference's `''.join(rec['speech'])`,
    // minutes_spider.py:157-160) feed the keyphrase extractor; the concat
    // is only aggregated when requested so the default path ships no
    // speech bodies through this shuffle.
    val joinedSpeech =
      if (collectKeyphrases)
        concat_ws("", transform(
          array_sort(collect_list(struct($"speech_order", $"speech"))),
          x => x.getField("speech"))).as("joined_speech")
      else lit("").as("joined_speech")
    val activities = speechRows
      .groupBy($"minutes_id", $"speaker", $"date")
      .agg(min_by($"speech_url", $"speech_order").as("first_url"), joinedSpeech)
      .flatMap { r =>
        val speaker = r.getAs[String]("speaker")
        membersB.value.get(speaker).map { memberId =>
          val mid = r.getAs[String]("minutes_id")
          val dt = java.sql.Timestamp.valueOf(r.getAs[String]("date") + " 00:00:00")
          Activity(ScrapeFns.activityId(memberId, mid, r.getAs[String]("date")),
            memberId, minutes_id = Some(mid), datetime = dt,
            keyphrases =
              if (collectKeyphrases)
                graft.extract.Keyphrases.extract(r.getAs[String]("joined_speech"), 3)
              else Nil)
        }
      }

    // R19 — bill-action state machine over moderator speeches; contexts
    // stay a Dataset (cogrouped on minutes_id inside BillActions.run) —
    // no driver collect, so the pipeline holds at full-corpus scale
    val contexts = minutes.map(m => MinutesCtx(m.id, m.topics, m.topic_ids))
    val speechRecs = speechRows
      .select($"minutes_id", $"speech_order", $"speaker", $"speech")
      .as[SpeechRec]
    val billActions = BillActions.run(spark, speechRecs, contexts, bills)

    Out(minutes, speeches, speechTexts, minutesTexts, activities, billActions, nextPositions)
  }
}
