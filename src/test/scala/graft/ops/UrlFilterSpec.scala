package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class UrlFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = UrlFilter.Config(
    blockedHosts = Set("banned.example"),
    blockedSuffixes = Seq(".bad.example"),
    wordWeights = Map("casino" -> 0.6, "poker" -> 0.5, "free" -> 0.2),
    softThreshold = 1.0,
    maxUrlLength = 80,
    maxDigitRatio = 0.5,
    maxQueryParams = 3,
    maxPathDepth = 4)

  private def verdicts(urls: String*): Map[String, String] =
    urls.toSeq.toDF("url")
      .select($"url", UrlFilter.verdict(col("url"), cfg).as("v"))
      .as[(String, String)].collect().toMap

  test("each rule fires; precedence is blocked_host > word_score > structural") {
    val v = verdicts(
      "https://ok.example/a/b",
      "https://banned.example/wholesome",
      "https://x.bad.example/a",
      "https://ok.example/free-casino-poker",          // 1.3 >= 1.0
      "https://ok.example/free-casino",                // 0.8 < 1.0 -> ok
      "https://ok.example/" + "p/" * 40,               // too_long wins over depth
      "https://ok.example/x777777777",                 // digits/len > 0.5
      "https://ok.example/a?k1=1&k2=2&k3=3&k4=4",      // 4 params > 3
      "https://ok.example/a/b/c/d/e",                  // depth 5 > 4
      "https://banned.example/free-casino-poker")      // host wins over words
    assert(v("https://ok.example/a/b") == "ok")
    assert(v("https://banned.example/wholesome") == "blocked_host")
    assert(v("https://x.bad.example/a") == "blocked_host")
    assert(v("https://ok.example/free-casino-poker") == "word_score")
    assert(v("https://ok.example/free-casino") == "ok")
    assert(v("https://ok.example/" + "p/" * 40) == "too_long")
    assert(v("https://ok.example/x777777777") == "digit_ratio")
    assert(v("https://ok.example/a?k1=1&k2=2&k3=3&k4=4") == "query_params")
    assert(v("https://ok.example/a/b/c/d/e") == "path_depth")
    assert(v("https://banned.example/free-casino-poker") == "blocked_host")
  }

  test("mixed-case URLs cannot evade the gate (host match is case-folded)") {
    val v = verdicts(
      "HTTPS://BANNED.example/wholesome",
      "https://X.BAD.EXAMPLE/a",
      "HTTPS://ok.example/x777777777", // uppercase scheme: structural rules still fire
      "https://ok.example/FREE-CASINO-POKER")
    assert(v("HTTPS://BANNED.example/wholesome") == "blocked_host")
    assert(v("https://X.BAD.EXAMPLE/a") == "blocked_host")
    assert(v("HTTPS://ok.example/x777777777") == "digit_ratio")
    assert(v("https://ok.example/FREE-CASINO-POKER") == "word_score")
    // the twin (the engine-side gate) agrees
    assert(UrlFilter.verdictOf("HTTPS://SPAM.bad.example/Poker", cfg) == "blocked_host")
    // and mixed-case CONFIG values match lowercase hosts
    val upCfg = UrlFilter.Config(blockedHosts = Set("Banned.Example"))
    assert(UrlFilter.verdictOf("https://banned.example/x", upCfg) == "blocked_host")
  }

  test("scala twin == column plane on adversarial URLs") {
    val urls = Seq(
      "https://ok.example/a/b",
      "https://banned.example/x",
      "https://sub.x.bad.example/",
      "https://ok.example",                        // no path at all
      "https://ok.example/",                       // root
      "https://ok.example/a?x=1&",                 // trailing & counts
      "https://ok.example/a?",                     // empty query
      "https://ok.example/a#frag?notquery=1",      // fragment before ?
      "https://ok.example/a/b/c/d/",               // trailing slash no depth
      "https://ok.example/CASINO-Free-POKER",      // case-folded words
      "https://ok.example/12a34",                  // mixed digits
      "not a url at all",
      "",
      "ftp9+x.y-z://ok.example/a",
      "https://ok.example/" + "7" * 60,
      "HTTPS://SPAM.bad.example/Poker",             // uppercase scheme+host
      "https://ok.example/999\uD83D\uDE00")         // supplementary char in path
    val colPlane = urls.toDF("url")
      .select($"url", UrlFilter.verdict(col("url"), cfg).as("v"))
      .as[(String, String)].collect().toMap
    for (u <- urls)
      assert(UrlFilter.verdictOf(u, cfg) == colPlane(u), s"url=$u")
  }

  test("audit + keep: survivors are exactly the ok rows") {
    val df = Seq(
      (1L, "https://ok.example/a"),
      (2L, "https://banned.example/a"),
      (3L, "https://ok.example/free-casino-poker")).toDF("id", "url")
    val audited = UrlFilter.audit(df, "url", cfg)
    assert(audited.filter(col("url_verdict") === "ok")
      .select($"id".as[Long]).collect().toSeq == Seq(1L))
    assert(UrlFilter.keep(df, "url", cfg)
      .select($"id".as[Long]).collect().toSeq == Seq(1L))
    val s3 = audited.filter(col("id") === 3L)
      .select($"word_score".as[Double]).head()
    assert(math.abs(s3 - 1.3) < 1e-12)
  }

  test("e2e: UrlFilterSkippingParser keeps a blocked host out of the frontier") {
    import graft.engine._
    import graft.fetch.SyntheticSite
    val site = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2,
      hotFactor = 2)
    val seeds = Seq(SeedSpec(site.pageUrl(0, 0)))
    def hosts(e: WaveEngine): Set[String] = e.fetchedTable()
      .filter(col("status") === 200)
      .select($"host".as[String]).distinct().collect().toSet

    val open = new WaveEngine(spark, site,
      Map[String, PageParser]("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("uf1"),
        hostBuckets = 8, fetchPartitions = 2))
    open.run(seeds)
    assert(hosts(open) == Set("h0.example.jp", "h1.example.jp"))

    val gate = UrlFilter.Config(blockedHosts = Set("h1.example.jp"))
    val gated = new WaveEngine(spark, site,
      Map[String, PageParser](
        "follow_links" -> UrlFilterSkippingParser(FollowAllLinks, gate)),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("uf2"),
        hostBuckets = 8, fetchPartitions = 2))
    gated.run(seeds)
    assert(hosts(gated) == Set("h0.example.jp"))
  }
}
