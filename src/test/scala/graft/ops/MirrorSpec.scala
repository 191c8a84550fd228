package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MirrorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], minC: Double = 0.5,
      maxDf: Int = 256) =
    Mirror.mirrorHosts(rows.toDF("host", "h"), "host", "h", minC, maxDf)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("containment over distinct page hashes, hand-computed") {
    val got = run(Seq(
      ("h1", 1L), ("h1", 2L), ("h1", 3L), ("h1", 4L),
      ("h2", 1L), ("h2", 2L), ("h2", 3L), ("h2", 9L),
      ("h2", 9L), // duplicate page rows collapse
      ("h3", 100L), ("h3", 1L)))
    // h1∩h2 = {1,2,3} → 3/min(4,4) = 0.75
    assert(got(("h1", "h2")) == ((3L, 0.75)))
    // h1∩h3 = {1} → 1/min(4,2) = 0.5 (boundary kept)
    assert(got(("h1", "h3")) == ((1L, 0.5)))
    // h2∩h3 = {1} → 0.5
    assert(got(("h2", "h3")) == ((1L, 0.5)))
  }

  test("df cap drops boilerplate hashes BEFORE pair expansion (conservative)") {
    // every host serves boilerplate hash 0; only h1/h2 truly mirror
    val rows = (1 to 6).map(k => (s"h$k", 0L)) ++ Seq(
      ("h1", 10L), ("h1", 11L), ("h2", 10L), ("h2", 11L),
      ("h3", 30L), ("h4", 40L), ("h5", 50L), ("h6", 60L))
    val capped = run(rows, minC = 0.5, maxDf = 3)
    // hash 0 (df=6 > 3) contributes nothing: only the real mirror remains
    assert(capped.keySet == Set(("h1", "h2")))
    assert(capped(("h1", "h2")) == ((2L, 2.0 / 3.0)))
    val uncapped = run(rows, minC = 0.5, maxDf = 100)
    // without the cap the boilerplate hash fabricates pairs
    assert(uncapped.keySet.size > 1)
    // cap only ever LOWERS containment (sizes stay pre-cap)
    assert(capped(("h1", "h2"))._2 <= uncapped(("h1", "h2"))._2)
  }

  test("mirrorGroups: transitive closure + canonical = most pages, loner absent") {
    // group 1: a1~a2~a3 chained (a1/a3 share only via a2); a2 largest.
    // group 2: b1~b2. c1 shares nothing.
    val rows = Seq(
      ("a1", 1L), ("a1", 2L),
      ("a2", 1L), ("a2", 2L), ("a2", 3L), ("a2", 4L),
      ("a3", 3L), ("a3", 4L),
      ("b1", 10L), ("b1", 11L), ("b2", 10L), ("b2", 11L),
      ("c1", 99L))
    val got = Mirror.mirrorGroups(rows.toDF("host", "h"), "host", "h",
        minContainment = 0.9, maxHashDf = 256)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // a1∩a3 = ∅ yet one group via a2; canonical a2 (4 pages)
    assert(got.keySet == Set("a1", "a2", "a3", "b1", "b2"))
    assert(got("a1") == (("a2", 3L, 2L, false)))
    assert(got("a2") == (("a2", 3L, 4L, true)))
    assert(got("a3") == (("a2", 3L, 2L, false)))
    // b-group ties on pages (2,2) → smallest host string wins
    assert(got("b1") == (("b1", 2L, 2L, true)))
    assert(got("b2") == (("b1", 2L, 2L, false)))
  }

  test("e2e mirror feedback: crawl → mirror groups → re-crawl skips the non-canonical copies") {
    import graft.engine._
    import graft.fetch.{MirroredSite, SyntheticSite}
    import org.apache.spark.sql.functions.{col, to_json, xxhash64}
    val inner = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    val site = MirroredSite(inner, Map(
      "m0.example.jp" -> "h0.example.jp", "m1.example.jp" -> "h1.example.jp"))
    val seeds = (0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0)))
    def pages(e: WaveEngine) = e.fetchedTable()
      .filter(col("status") === 200 && col("parse_fn") =!= "media")
      .select(col("host"), xxhash64(to_json(col("spans"))).as("h"))

    val e1 = new WaveEngine(spark, site,
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("mir1"),
        hostBuckets = 8, fetchPartitions = 2))
    e1.run(seeds)
    val p1 = pages(e1).cache()
    val hosts1 = p1.select($"host".as[String]).distinct().collect().toSet
    // cross-links remapped into mirror space pull the crawl onto BOTH copies
    assert(hosts1 == Set("h0.example.jp", "h1.example.jp", "m0.example.jp", "m1.example.jp"))
    val contents1 = p1.select($"h".as[Long]).distinct().collect().toSet
    assert(contents1.size == inner.totalPages) // mirror pages add no content
    val waste = p1.count() - inner.totalPages
    assert(waste > 0) // ... but they did cost fetches

    val groups = Mirror.mirrorGroups(p1, "host", "h", minContainment = 0.9)
    val skip = Mirror.skipHosts(groups)
    assert(skip == Set("m0.example.jp", "m1.example.jp")) // primaries canonical (size, then name)

    val e2 = new WaveEngine(spark, site,
      Map[String, PageParser](
        "follow_links" -> MirrorSkippingParser(FollowAllLinks, skip)),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("mir2"),
        hostBuckets = 8, fetchPartitions = 2))
    e2.run(seeds)
    val p2 = pages(e2).cache()
    // zero mirror waste, full content coverage
    assert(p2.select($"host".as[String]).distinct().collect().toSet ==
      Set("h0.example.jp", "h1.example.jp"))
    assert(p2.count() == inner.totalPages.toLong)
    assert(p2.select($"h".as[Long]).distinct().collect().toSet == contents1)
    p1.unpersist(); p2.unpersist()
  }
}
