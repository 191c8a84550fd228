package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TrapsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("digit runs collapse; big low-novelty template flagged, diverse one not") {
    // calendar trap: 6 urls, one content hash. articles: 4 urls, 4 hashes.
    val rows =
      (1 to 6).map(d => (s"http://t.ex/cal/2020/$d", 77L)) ++
      (1 to 4).map(d => (s"http://t.ex/art/$d", 100L + d)) ++
      Seq(("http://t.ex/about", 9L)) // no digits: template = raw path
    val got = Traps.templateStats(rows.toDF("url", "h"), "url", "h",
        minUrls = 5, maxNovelty = 0.2)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got("/cal/{d}/{d}") == ((6L, 1L, 1.0 / 6.0, true)))
    assert(got("/art/{d}") == ((4L, 4L, 1.0, false)))     // below minUrls, novel
    assert(got("/about") == ((1L, 1L, 1.0, false)))
    // the host column is derived from the url, not passed in
    val hosts = Traps.templateStats(rows.toDF("url", "h"), "url", "h")
      .select("host").distinct().as[String].collect()
    assert(hosts.toSeq == Seq("t.ex"))
  }

  test("same template on different hosts stays separate") {
    val rows = Seq(
      ("http://a.ex/p/1", 1L), ("http://a.ex/p/2", 1L),
      ("http://b.ex/p/1", 2L), ("http://b.ex/p/2", 3L))
    val got = Traps.templateStats(rows.toDF("url", "h"), "url", "h",
        minUrls = 2, maxNovelty = 0.5)
      .as[(String, String, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(got(("a.ex", "/p/{d}")) == true)   // 2 urls, 1 hash
    assert(got(("b.ex", "/p/{d}")) == false)  // 2 urls, 2 hashes
  }

  test("templateOf agrees with the miner's scan-stage template projection") {
    import org.apache.spark.sql.functions.{col, regexp_extract, regexp_replace}
    val urls = Seq(
      "https://a.ex/cal/2020/12/5",
      "https://a.ex/p3",
      "https://a.ex/about",
      "https://a.ex/",
      "https://a.ex",                      // no path at all
      "https://a.ex/x2y9z?page=3#f",       // query/fragment excluded
      "https://a.ex/2020abc2021")          // adjacent runs collapse separately
    val viaOp = urls.map(Traps.templateOf)
    val viaMiner = urls.toDF("url").select(
        regexp_replace(
          regexp_extract(col("url"), "^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1),
          "[0-9]+", "{d}").as("t"))
      .as[String].collect().toSeq
    assert(viaOp == viaMiner)
    assert(Traps.templateOf("https://a.ex/cal/2020/12/5") == "/cal/{d}/{d}/{d}")
  }

  test("e2e trap feedback: crawl → template mining → re-crawl stops admitting the trap family") {
    import graft.engine._
    import graft.fetch.{SyntheticSite, TrapSite}
    import org.apache.spark.sql.functions.{col, to_json, xxhash64}
    val inner = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    val site = TrapSite(inner, calPerPage = 3)
    val seeds = (0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0)))
    def pages(e: WaveEngine) = e.fetchedTable()
      .filter(col("status") === 200 && col("parse_fn") =!= "media")
      .select(col("canonical").as("url"), xxhash64(to_json(col("spans"))).as("h"))

    val e1 = new WaveEngine(spark, site,
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("trap1"),
        hostBuckets = 8, fetchPartitions = 2))
    e1.run(seeds)
    val p1 = pages(e1).cache()
    // blind crawl fetched every distinct-URL calendar page: 3 per page
    assert(p1.count() == 4L * inner.totalPages) // 12 pages + 36 cal fetches
    val goodContents = p1.filter(!col("url").contains("/cal/"))
      .select($"h".as[Long]).distinct().collect().toSet

    val stats = Traps.templateStats(p1, "url", "h", minUrls = 10, maxNovelty = 0.1)
    val tm = Traps.trapMap(stats)
    // exactly the cal template, on both hosts; /p{d} survives (diverse/small)
    assert(tm == Map(
      "h0.example.jp" -> Set("/cal/{d}/{d}"),
      "h1.example.jp" -> Set("/cal/{d}/{d}")))

    val e2 = new WaveEngine(spark, site,
      Map[String, PageParser](
        "follow_links" -> TrapSkippingParser(FollowAllLinks, tm)),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("trap2"),
        hostBuckets = 8, fetchPartitions = 2))
    e2.run(seeds)
    val p2 = pages(e2).cache()
    // the family is gone, the hosts' real pages all still crawl
    assert(p2.filter(col("url").contains("/cal/")).count() == 0)
    assert(p2.count() == inner.totalPages.toLong)
    assert(p2.select($"h".as[Long]).distinct().collect().toSet == goodContents)
    p1.unpersist(); p2.unpersist()
  }
}
