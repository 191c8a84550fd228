package graft.engine

import graft.SparkTestSession
import graft.extract.transforms.{Fixtures, ParseOut, ShugiinBills, SpanTables}
import graft.fetch.MapFetcher
import graft.model._
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * SURVEY §7.2 "minimum end-to-end slice": the shugiin fixtures crawled
 * through the WaveEngine loop (real frontier, dedup, politeness plumbing),
 * parsed by the spider transforms, MERGEd through the snapshot sinks, and
 * queried — "bills of diet 204 with groups and PDF URLs" — against a
 * hand-computed golden.
 */
class WaveE2ESpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // --- the fixture site -------------------------------------------------
  private val indexUrl = "https://www.shugiin.go.jp/kaiji204.htm"
  private val keika1 = Fixtures.doc("https://www.shugiin.go.jp/keika/g20409001.htm",
    ("caption", "経過", ""),
    ("row", "", ""), ("table_cell", "議案提出の賛成者", ""),
    ("table_cell", "自由民主党", ""))
  private val keika2 = Fixtures.doc("https://www.shugiin.go.jp/keika/g20409002.htm",
    ("caption", "経過", ""),
    ("row", "", ""), ("table_cell", "備考", ""), ("table_cell", "", ""))
  private val honbun1 = Fixtures.doc("https://www.shugiin.go.jp/honbun/g20409001.htm",
    ("link", "提出時法律案", "https://www.shugiin.go.jp/houan/g20409001.htm"))
  private val houan1 = Fixtures.doc("https://www.shugiin.go.jp/houan/g20409001.htm",
    ("text", "犬法の一部を次のように改正する。", ""),
    ("text", "附 則", ""),
    ("text", "この法律は、公布の日から施行する。", ""),
    ("text", "理 由", ""),
    ("text", "誤字を修正するため。", ""))

  private val site = new MapFetcher(Map(
    indexUrl -> Document(indexUrl, Fixtures.shugiinIndex.spans),
    keika1.doc_id -> keika1,
    keika2.doc_id -> keika2,
    Fixtures.keikaPage.doc_id -> Fixtures.keikaPage, // g20405005 keika (groups)
    honbun1.doc_id -> honbun1,
    houan1.doc_id -> houan1,
    "https://www.shugiin.go.jp/honbun/g20405005.htm" ->
      Document("https://www.shugiin.go.jp/honbun/g20405005.htm",
        Seq(Span("link", "提出時法律案", "https://www.shugiin.go.jp/houan/g20405005.htm", 0))),
    "https://www.shugiin.go.jp/houan/g20405005.htm" ->
      Document("https://www.shugiin.go.jp/houan/g20405005.htm", Fixtures.houanPage.spans)))

  // --- parsers: frontier expansion only (entities come from transforms) --
  private val parsers: Map[String, PageParser] = Map(
    "shugiin_index" -> new PageParser {
      def followUps(doc: Document, meta: Map[String, String]) = ShugiinBills.parse(doc).follow
    },
    "shugiin_honbun" -> new PageParser {
      def followUps(doc: Document, meta: Map[String, String]) =
        ShugiinBills.parseHonbun(doc, meta).follow
    },
    "shugiin_houan" -> NoFollow,
    "shugiin_keika" -> NoFollow)

  test("crawl → transforms → MERGE → 'bills of diet 204 with groups and PDF urls'") {
    val ckpt = SparkTestSession.tmpDir("e2e")
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = ckpt, hostBuckets = 4, fetchPartitions = 2))
    val res = engine.run(Seq(SeedSpec(indexUrl, parseFn = "shugiin_index")))
    // index + 3 keika + 2 honbun + 2 houan
    assert(res.fetched == 8)

    // transforms over the fetched table, dispatched on parse_fn (the same
    // row-local functions the reference runs per response)
    val fetched = engine.fetchedTable()
      .select($"parse_fn", $"meta", $"doc_id", $"spans")
      .as[(String, Map[String, String], String, Seq[Span])]
    val outs = fetched.map { case (fn, meta, docId, spans) =>
      val doc = Document(docId, spans)
      fn match {
        case "shugiin_index" => ShugiinBills.parse(doc)
        case "shugiin_honbun" => ShugiinBills.parseHonbun(doc, meta)
        case "shugiin_houan" => ShugiinBills.parseHouan(doc, meta)
        case "shugiin_keika" => ShugiinBills.parseKeika(doc, meta)
        case _ => ParseOut()
      }
    }.cache()

    val root = SparkTestSession.tmpDir("e2etables")
    val billsTable = new SnapshotTable(spark, s"$root/bills")
    val urlsTable = new SnapshotTable(spark, s"$root/urls")
    // MERGE in per-family passes like the reference's per-response merges:
    // the index's full bills first, then partial-field updates that carry
    // ONLY the fields they scraped (the reference merges partial entities;
    // K1 coalesces field-wise, so absent columns never clobber)
    billsTable.merge(outs.flatMap(_.bills.filter(_.bill_number.nonEmpty)).toDF())
    billsTable.merge(outs.flatMap(_.bills.filter(b =>
        b.bill_number.isEmpty && b.reason.isDefined))
      .toDF().select($"id", $"reason"))
    billsTable.merge(outs.flatMap(_.bills.filter(b =>
        b.bill_number.isEmpty && (b.supported_groups.nonEmpty || b.opposed_groups.nonEmpty)))
      .toDF().select($"id", $"supported_groups", $"opposed_groups"))
    urlsTable.merge(outs.flatMap(_.urls).toDF())

    // the §7.2 query: bills of diet 204 with their groups and PDF/page urls
    val result = billsTable.read().as("b")
      .filter($"b.diet_number" === 204)
      .join(urlsTable.read().as("u"), $"u.to_id" === $"b.id", "left_outer")
      .groupBy($"b.bill_number", $"b.name", $"b.reason",
        $"b.supported_groups", $"b.opposed_groups")
      .agg(sort_array(collect_list(struct($"u.title", $"u.url"))).as("urls"))
      .orderBy($"bill_number")
      .collect()

    assert(result.length == 3)
    val byNumber = result.map(r => r.getAs[String]("bill_number") -> r).toMap

    val inu = byNumber("204-閣-1")
    assert(inu.getAs[String]("name") == "犬法の一部を改正する法律案")
    assert(inu.getAs[String]("reason") == "誤字を修正するため。") // via honbun → houan
    assert(inu.getSeq[String](inu.fieldIndex("supported_groups")) == Seq("JIMIN"))
    assert(inu.getSeq[org.apache.spark.sql.Row](inu.fieldIndex("urls"))
      .map(_.getAs[String]("title")).sorted == Seq("HONBUN", "KEIKA"))

    val neko = byNumber("204-閣-2") // no honbun link, empty keika → no groups/reason
    assert(neko.getAs[String]("reason") == null)
    assert(neko.getSeq[org.apache.spark.sql.Row](neko.fieldIndex("urls"))
      .map(_.getAs[String]("title")) == Seq("KEIKA"))

    val usagi = byNumber("204-衆-5")
    assert(usagi.getSeq[String](usagi.fieldIndex("supported_groups")) == Seq("JIMIN", "KOMEI"))
    assert(usagi.getSeq[String](usagi.fieldIndex("opposed_groups")) == Seq("RIKKEN"))
    assert(usagi.getAs[String]("reason") == "誤字を修正するため。")

    // frontier-side invariants: every page fetched exactly once
    val perUrl = engine.fetchedTable().groupBy($"canonical").count().collect()
    assert(perUrl.forall(_.getLong(1) == 1L))
  }
}
