package graft.ops

import graft.SparkTestSession
import graft.model.{Span, SpanHash}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class RevalidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- SpanHash

  test("SpanHash: Scala twin ≡ Catalyst column, bit for bit") {
    val cases: Seq[Seq[Span]] = Seq(
      Nil,
      Seq(Span("text", "hello", "", 0)),
      Seq(Span("text", "審議 可決", null, 0), Span("link", "/p1", "", 1)),
      Seq(Span("media", "", "https://h0.example.jp/img.png", 2)),
      Seq(Span("text", null, null, 7)),
      Seq(Span("text", "a", "", 0), Span("text", "a", "", 1)), // offset matters
      Seq(Span("text", "ab", "", 0)) // separator char inside text
    )
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "spans")
    val got = df.select(col("i"), SpanHash.column(col("spans")).as("h"))
      .as[(Int, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == SpanHash.of(s), s"case $i: $s")
    }
    // order-sensitivity: swapping two spans changes the hash
    assert(SpanHash.of(Seq(Span("text", "a", "", 0), Span("text", "b", "", 1))) !=
      SpanHash.of(Seq(Span("text", "b", "", 1), Span("text", "a", "", 0))))
  }

  // ---------------------------------------------------------------- plan

  test("plan: conditional with the LAST validator; full when no history") {
    val hist = Seq(
      ("u1", 0, 11L), ("u1", 3, 13L), ("u1", 1, 12L), // last = wave 3
      ("u2", 5, 20L)
    ).toDF("url", "wave", "validator")
    val due = Seq("u1", "u3", "u1").toDF("url") // dup due rows collapse
    val got = Revalidate.plan(due, hist)
      .as[(String, String, Option[Long])].collect().toSet
    assert(got == Set(
      ("u1", "conditional", Some(13L)),
      ("u3", "full", None)))
  }

  // ---------------------------------------------------------------- fetcher

  test("fetchConditional default: 304 on matching validator, full result otherwise") {
    val doc = graft.model.Document("u", Seq(Span("text", "body", "", 0)))
    val f = new graft.fetch.MapFetcher(Map("u" -> doc))
    assert(f.fetchConditional("u", SpanHash.of(doc.spans)) == ((304, None)))
    assert(f.fetchConditional("u", 12345L) == ((200, Some(doc))))
    assert(f.fetchConditional("missing", 0L)._1 == 404) // errors pass through
  }

  // ---------------------------------------------------------------- e2e

  test("e2e revalidation: refresh crawl 304s the unchanged subset; resolve ≡ a fresh full crawl") {
    import graft.engine._
    import graft.fetch.{SyntheticSite, VersionedSite}
    val inner = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    def crawl(version: Int, seeds: Seq[SeedSpec], tag: String,
        parser: PageParser = FollowAllLinks) = {
      val e = new WaveEngine(spark, VersionedSite(inner, version),
        Map[String, PageParser]("follow_links" -> parser),
        CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir(tag),
          hostBuckets = 4, fetchPartitions = 2))
      e.run(seeds)
      e
    }
    // discovery crawl on version 1
    val e1 = crawl(1, (0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0))), "rv1")
    val prior = e1.fetchedTable().cache()
    val hist = Revalidate.observations(prior)
    val allUrls = prior.select($"canonical".as[String]).distinct().collect().toSeq.sorted
    assert(allUrls.size.toLong == inner.totalPages)

    // plan a full refresh: every url has history → all conditional
    val plan = Revalidate.plan(allUrls.toDF("url"), hist).cache()
    assert(plan.filter(col("mode") =!= "conditional").count() == 0)
    val seeds2 = Sources.revalidatingSeeds(plan, parseFn = "follow_links")
    assert(seeds2.forall(_.meta.contains(Sources.IfHashKey)))

    // refresh crawl against version 2
    val e2 = crawl(2, seeds2, "rv2", NoFollow)
    val refresh = e2.fetchedTable().cache()
    val changed = (0 until 2).flatMap(k =>
      (0 until inner.pagesOf(k)).collect {
        case i if VersionedSite(inner, 1).changes(k, i) => inner.pageUrl(k, i)
      }).toSet
    // 304 exactly on the unchanged subset, bodies elided
    val got304 = refresh.filter(col("status") === 304)
      .select($"canonical".as[String]).collect().toSet
    assert(got304 == allUrls.toSet -- changed)
    assert(refresh.filter(col("status") === 304)
      .filter(org.apache.spark.sql.functions.size(col("spans")) =!= 0).count() == 0)
    val got200 = refresh.filter(col("status") === 200)
      .select($"canonical".as[String]).collect().toSet
    assert(got200 == changed)

    // politeness: 304s still consume their host's slots (a conditional GET
    // is a request like any other) — slots are a contiguous 0..n-1 run
    val slotAudit = refresh.groupBy(col("host")).agg(
      org.apache.spark.sql.functions.countDistinct(col("slot")).as("ds"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
      org.apache.spark.sql.functions.max(col("slot")).as("mx"))
      .as[(String, Long, Long, Int)].collect()
    slotAudit.foreach { case (h, ds, n, mx) =>
      assert(ds == n && mx.toLong == n - 1, s"host $h slots not contiguous")
    }

    // resolve(refresh, prior) reproduces a fresh full crawl of version 2,
    // span-sequence equal per row (kind, text, media_ref, order)
    val resolved = Revalidate.resolve(refresh, prior)
    val fresh = crawl(2, allUrls.map(u => SeedSpec(u)), "rv3", NoFollow).fetchedTable()
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select($"canonical".as[String],
        SpanHash.column(col("spans")).as[Long]).collect().toMap
    val a = keyed(resolved); val b = keyed(fresh)
    assert(a.keySet == allUrls.toSet && a == b)

    // and the resolved view feeds Recrawl with NO phantom changes: the
    // unchanged pages hash identical to the prior run's observations
    val obsPrior = Revalidate.observations(prior)
      .select($"url".as[String], $"validator".as[Long]).collect().toMap
    val obsNow = Revalidate.observations(resolved)
      .select($"url".as[String], $"validator".as[Long]).collect().toMap
    (allUrls.toSet -- changed).foreach(u => assert(obsNow(u) == obsPrior(u), u))
    changed.foreach(u => assert(obsNow(u) != obsPrior(u), u))

    prior.unpersist(); plan.unpersist(); refresh.unpersist()
  }

  test("e2e distributive revalidation: revalidateFrom stamps validators without per-seed meta") {
    import graft.engine._
    import graft.fetch.{SyntheticSite, VersionedSite}
    val inner = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    val ck1 = graft.SparkTestSession.tmpDir("rvd1")
    val e1 = new WaveEngine(spark, VersionedSite(inner, 1),
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = ck1, hostBuckets = 4, fetchPartitions = 2))
    e1.run((0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0))))
    val allUrls = e1.fetchedTable().select($"canonical".as[String])
      .distinct().collect().toSeq.sorted

    // refresh on version 2 with PLAIN seeds — validators come from the
    // prior run's fetched dir via the engine's O(urls) validator plane
    val e2 = new WaveEngine(spark, VersionedSite(inner, 2),
      Map[String, PageParser]("follow_links" -> NoFollow),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("rvd2"),
        hostBuckets = 4, fetchPartitions = 2,
        revalidateFrom = Some(s"$ck1/fetched")))
    e2.run(allUrls.map(u => SeedSpec(u)))
    val refresh = e2.fetchedTable()
    val changed = (0 until 2).flatMap(k =>
      (0 until inner.pagesOf(k)).collect {
        case i if VersionedSite(inner, 1).changes(k, i) => inner.pageUrl(k, i)
      }).toSet
    val got304 = refresh.filter(col("status") === 304)
      .select($"canonical".as[String]).collect().toSet
    assert(got304 == allUrls.toSet -- changed)
    assert(refresh.filter(col("status") === 200)
      .select($"canonical".as[String]).collect().toSet == changed)
  }

  test("S11 x S14 composition: fresh cache hits skip the network; stale-cache misses revalidate") {
    import graft.engine._
    import graft.fetch.{SyntheticSite, VersionedSite}
    val inner = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    val ck1 = graft.SparkTestSession.tmpDir("rvc1")
    val e1 = new WaveEngine(spark, VersionedSite(inner, 1),
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = ck1, hostBuckets = 4, fetchPartitions = 2))
    e1.run((0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0))))
    val allUrls = e1.fetchedTable().select($"canonical".as[String])
      .distinct().collect().toSeq.sorted
    def refresh(tag: String, ttlSec: Long) = {
      val e = new WaveEngine(spark, VersionedSite(inner, 1), // content UNCHANGED
        Map[String, PageParser]("follow_links" -> NoFollow),
        CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir(tag),
          hostBuckets = 4, fetchPartitions = 2,
          fetchCacheDir = Some(s"$ck1/fetched"), cacheTtlSec = ttlSec,
          revalidateFrom = Some(s"$ck1/fetched")))
      e.run(allUrls.map(u => SeedSpec(u)))
      e.fetchedTable()
    }
    // fresh cache: every row served from cache, zero conditional fetches
    val hot = refresh("rvc2", ttlSec = 3600)
    assert(hot.filter($"from_cache" === false).count() == 0)
    assert(hot.filter($"status" === 304).count() == 0)
    // expired cache: every row misses, revalidates, and 304s (unchanged)
    val cold = refresh("rvc3", ttlSec = 0)
    assert(cold.filter($"from_cache" === true).count() == 0)
    assert(cold.filter($"status" =!= 304).count() == 0)
  }

  test("resolve: duplicate prior copies collapse to the latest (wave, seq)") {
    // minimal fetched-table-shaped frames: canonical/status/wave/seq/doc_id/spans
    val prior = Seq(
      ("u", 200, 0, 1L, "u", Seq(Span("text", "old", "", 0))),
      ("u", 200, 2, 9L, "u", Seq(Span("text", "new", "", 0)))
    ).toDF("canonical", "status", "wave", "seq", "doc_id", "spans")
    val refresh = Seq(
      ("u", 304, 3, 11L, "u", Seq.empty[Span])
    ).toDF("canonical", "status", "wave", "seq", "doc_id", "spans")
    val out = Revalidate.resolve(refresh, prior)
      .select($"canonical".as[String], $"spans".as[Seq[Span]]).collect()
    assert(out.length == 1 && out.head._2 == Seq(Span("text", "new", "", 0)))
  }
}
