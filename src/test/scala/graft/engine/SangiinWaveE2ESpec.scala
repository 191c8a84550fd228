package graft.engine

import graft.SparkTestSession
import graft.extract.transforms.{Fixtures, SangiinBills, SangiinPipeline}
import graft.fetch.MapFetcher
import graft.model._
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Second end-to-end slice (VERDICT r2 #9): the sangiin family crawled
 * through the WaveEngine loop — index → meisai follow-ups (one of which
 * 404s, exercising S13 404-as-data inside the full loop) — parsed by
 * SangiinBills, MERGEd as partial-field lifecycle updates (K1), joined
 * through SangiinPipeline (R8/R9), and queried: "bills of diet 204 with
 * lifecycle dates and committee edges".
 */
class SangiinWaveE2ESpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val indexUrl = "https://www.sangiin.go.jp/gian/204/gian.htm"

  // m20409001 (bill 204-閣-1's meisai) is intentionally absent → 404
  private val site = new MapFetcher(Map(
    indexUrl -> Document(indexUrl, Fixtures.sangiinIndex.spans),
    Fixtures.sangiinMeisai.doc_id -> Fixtures.sangiinMeisai))

  private val parsers: Map[String, PageParser] = Map(
    "sangiin_index" -> new PageParser {
      def followUps(doc: Document, meta: Map[String, String]) =
        SangiinBills.parse(doc).follow
    },
    "sangiin_meisai" -> NoFollow)

  test("crawl → transforms → MERGE → 'bills of diet 204 with lifecycle dates and committee edges'") {
    val ckpt = SparkTestSession.tmpDir("sangiine2e")
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = ckpt, hostBuckets = 4, fetchPartitions = 2))
    val res = engine.run(Seq(SeedSpec(indexUrl, parseFn = "sangiin_index")))
    assert(res.fetched == 3) // index + 2 meisai follow-ups (one a 404)

    val rows = engine.fetchedTable()
      .select($"parse_fn", $"meta", $"doc_id", $"spans", $"status")
      .as[(String, Map[String, String], String, Seq[Span], Int)]
      .cache()

    val indexOuts = rows.filter(_._1 == "sangiin_index")
      .map { case (_, _, docId, spans, _) => SangiinBills.parse(Document(docId, spans)) }
      .cache()
    // the 404'd meisai contributes no entity rows but IS recorded data
    val meisai = rows
      .filter(r => r._1 == "sangiin_meisai" && r._5 == 200)
      .flatMap { case (_, meta, docId, spans, _) =>
        SangiinBills.parseMeisai(Document(docId, spans), meta)
      }
      .cache()

    // quarantine: the index fixture carries an arity-violating row and an
    // unmatched caption — both must be rejected, not silently dropped
    assert(indexOuts.flatMap(_.quarantined.map(q => q)).count() >= 1)

    val root = SparkTestSession.tmpDir("sangiintables")
    val billsTable = new SnapshotTable(spark, s"$root/bills")
    billsTable.merge(indexOuts.flatMap(_.bills).toDF())
    // K1 partial-field lifecycle update from the meisai scrape — only the
    // fields the page carried; absent columns never clobber index fields
    billsTable.merge(meisai.toDF()
      .select($"bill_id".as("id"), $"submitted_date",
        $"passed_councilors_committee_date", $"passed_councilors_date",
        $"passed_representatives_committee_date", $"passed_representatives_date",
        $"first_house", $"is_passed"))

    val committees = Seq(
      Committee("Committee:参議院内閣委員会", "参議院内閣委員会", house = Some("COUNCILORS")),
      Committee("Committee:衆議院法務委員会", "衆議院法務委員会", house = Some("REPRESENTATIVES"))).toDS()
    val members = Seq(Member("Member:逢沢一郎", "逢沢一郎")).toDS()
    val pout = SangiinPipeline.run(spark, meisai, committees, members)

    val edgesTable = new SnapshotTable(spark, s"$root/edges")
    edgesTable.mergeEdges(pout.billCommitteeEdges.toDF())
    edgesTable.mergeEdges(pout.memberBillEdges.toDF())

    // the slice query: diet-204 bills + lifecycle dates + committee edges
    val result = billsTable.read().as("b")
      .filter($"b.diet_number" === 204)
      .join(edgesTable.read().as("e"), $"e.from_id" === $"b.id", "left_outer")
      .groupBy($"b.bill_number", $"b.name", $"b.submitted_date",
        $"b.passed_councilors_committee_date", $"b.passed_councilors_date",
        $"b.passed_representatives_committee_date", $"b.passed_representatives_date",
        $"b.first_house", $"b.is_passed")
      .agg(sort_array(collect_list($"e.to_id")).as("committee_ids"))
      .orderBy($"bill_number")
      .collect()

    assert(result.length == 2)
    val byNumber = result.map(r => r.getAs[String]("bill_number") -> r).toMap

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val usagi = byNumber("204-参-9") // meisai parsed: gates exercised
    assert(usagi.getAs[String]("name") == "うさぎ保護法案")
    assert(usagi.getAs[java.sql.Timestamp]("submitted_date") == ts("2021-04-01 00:00:00"))
    assert(usagi.getAs[java.sql.Timestamp]("passed_councilors_committee_date")
      == ts("2021-04-10 00:00:00")) // 可決 → gate ON
    assert(usagi.getAs[java.sql.Timestamp]("passed_councilors_date")
      == ts("2021-04-15 00:00:00")) // 修正 → gate ON
    assert(usagi.getAs[java.sql.Timestamp]("passed_representatives_committee_date")
      == null) // 継続審査 → gate OFF despite a date present
    assert(usagi.getAs[java.sql.Timestamp]("passed_representatives_date") == null) // 否決
    assert(usagi.getAs[String]("first_house") == "COUNCILORS") // 本院先議
    assert(!usagi.getAs[Boolean]("is_passed"))
    assert(usagi.getSeq[String](usagi.fieldIndex("committee_ids"))
      == Seq("Committee:参議院内閣委員会")) // R9 exact join, house-prefixed

    val inu = byNumber("204-閣-1") // its meisai 404'd: index fields only
    assert(inu.getAs[String]("name") == "犬法の一部を改正する法律案")
    assert(inu.getAs[java.sql.Timestamp]("submitted_date") == null)
    assert(inu.getSeq[String](inu.fieldIndex("committee_ids")).isEmpty)

    // R8 containment join + activity: 逢沢一郎 ∈ "逢沢一郎君　外二名"
    val acts = pout.activities.collect()
    assert(acts.length == 1)
    assert(acts.head.member_id == "Member:逢沢一郎")
    assert(acts.head.bill_id.contains(meisai.head().bill_id))
    assert(acts.head.datetime == ts("2021-04-01 00:00:00"))
    assert(pout.memberBillEdges.collect().toSeq ==
      Seq(Edge("Member:逢沢一郎", meisai.head().bill_id)))

    // frontier-side invariant: every URL fetched exactly once
    val perUrl = engine.fetchedTable().groupBy($"canonical").count().collect()
    assert(perUrl.length == 3 && perUrl.forall(_.getLong(1) == 1L))
  }
}
