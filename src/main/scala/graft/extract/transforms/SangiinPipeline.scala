package graft.extract.transforms

import graft.extract.ScrapeFns
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dataset-plane joins for the sangiin meisai rows (SURVEY §3.2):
 *
 *  - R9 committee-by-name: the reference's `committee_finder.find_one(
 *    house + 付託委員会等)` (/root/reference/crawler/spiders/
 *    sangiin_spider.py:180-200) becomes an exact equi-join of the
 *    house-prefixed scraped names against the committee dim — broadcast
 *    (the dim is a few dozen rows; at any realistic scale it stays far
 *    under the broadcast threshold).
 *  - R8 member containment: `member_finder.find(発議者)` (:202-211)
 *    matches every member whose name appears in the submitter string —
 *    a broadcast non-equi join on `contains`, never a crossJoin of two
 *    big sides (the member dim is ~10^3).
 *  - Activities: one per (member, bill) with the bill's submitted date
 *    (`build_bill_activity`, :226-229), emitted only when the date parsed.
 */
object SangiinPipeline {

  final case class Out(
      billCommitteeEdges: Dataset[Edge],
      memberBillEdges: Dataset[Edge],
      activities: Dataset[Activity])

  def run(
      spark: SparkSession,
      meisai: Dataset[BillMeisai],
      committees: Dataset[Committee],
      members: Dataset[Member]): Out = {
    import spark.implicits._

    // R9 — exact committee name join (house prefix already applied by the
    // parse); emits Bill→Committee edges
    val billCommitteeEdges = meisai
      .select($"bill_id", explode($"committee_names").as("cname"))
      .join(broadcast(committees.select($"id".as("committee_id"), $"name".as("cname"))),
        Seq("cname"))
      .select($"bill_id".as("from_id"), $"committee_id".as("to_id"))
      .as[Edge]

    // R8 — submitter containment join: member name appears in 発議者 text
    val submitterHits = meisai
      .filter($"submitter_text".isNotNull)
      .select($"bill_id", $"submitted_date", $"submitter_text")
      .join(broadcast(members.select($"id".as("member_id"), $"name".as("mname"))),
        instr($"submitter_text", $"mname") > 0)
      .cache()

    val memberBillEdges = submitterHits
      .select($"member_id".as("from_id"), $"bill_id".as("to_id"))
      .as[Edge]

    val activities = submitterHits
      .filter($"submitted_date".isNotNull)
      .map { r =>
        val memberId = r.getAs[String]("member_id")
        val billId = r.getAs[String]("bill_id")
        val dt = r.getAs[java.sql.Timestamp]("submitted_date")
        Activity(ScrapeFns.activityId(memberId, billId, dt.toString),
          memberId, bill_id = Some(billId), datetime = dt)
      }

    Out(billCommitteeEdges, memberBillEdges, activities)
  }
}
