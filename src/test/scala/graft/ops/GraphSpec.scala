package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference power iteration — same semantics as Graph.pageRank
    * (dangling mass uniform, damping d), driver-side exact. */
  private def refPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int, d: Double): Map[Long, Double] = {
    val n = nodes.size
    val uniq = edges.distinct
    val out = uniq.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = uniq.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches reference power iteration on an irregular graph with dangling nodes") {
    val nodes = (0L until 20L).toSeq
    // hub at 0, chain, a dangling sink (19 and 7 emit nothing), self-loop at 5
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (0, 3), (0, 4), (1, 0), (2, 0), (3, 0), (4, 5),
      (5, 5), (5, 6), (6, 7), (8, 9), (9, 10), (10, 8), (11, 0), (12, 0),
      (13, 14), (14, 15), (15, 13), (16, 17), (17, 16), (18, 19),
      (0, 1)) // duplicate edge must collapse
    val got = Graph.pageRank(
        nodes.toDF("id"), edges.toDF("src", "dst"), iters = 7)
      .as[(Long, Double)].collect().toMap
    val want = refPageRank(nodes, edges, iters = 7, d = 0.85)
    assert(got.keySet == nodes.toSet)
    for (v <- nodes) assert(math.abs(got(v) - want(v)) < 1e-12, s"node $v")
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
    assert(got(0L) > got(18L)) // the hub outranks a leaf
  }

  test("pageRank on an empty edge set is uniform") {
    val got = Graph.pageRank((0L until 5L).toDF("id"),
        Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 3)
      .as[(Long, Double)].collect().toMap
    for (v <- got.values) assert(math.abs(v - 0.2) < 1e-12)
  }

  test("crawl feedback loop: host graph from fetched table → PageRank priorities → prioritized re-crawl") {
    import graft.engine._
    import graft.fetch.SyntheticSite
    val site = SyntheticSite(nHosts = 4, basePagesPerHost = 3, branching = 2, hotFactor = 3)
    val seeds = (0 until 4).map(k => SeedSpec(site.pageUrl(k, 0)))
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("rankcrawl"),
        hostBuckets = 8, fetchPartitions = 2))
    engine.run(seeds)

    val g = Graph.hostGraphFromFetched(engine.fetchedTable()).cache()
    val hosts = (g.select($"src".as[String]).collect() ++
      g.select($"dst".as[String]).collect()).toSet
    assert(hosts == (0 until 4).map(site.hostName).toSet)
    assert(g.filter($"src" =!= $"dst").count() > 0) // cross-host edges exist

    // 4 hosts into 4 ntile levels → a total priority order, deterministic
    val prio = Graph.hostPriorities(engine.fetchedTable(), levels = 4)
    assert(prio.keySet == hosts)
    assert(prio.values.toSet == Set(0, 1, 2, 3))
    assert(prio == Graph.hostPriorities(engine.fetchedTable(), levels = 4))

    // the wrapper stamps follow-ups by TARGET host (relative refs resolve
    // against the emitting page)
    val wrapped = RankPrioritizingParser(FollowAllLinks, prio)
    val doc = graft.model.Document(site.pageUrl(0, 0), Seq(
      graft.model.Span("link", "", site.pageUrl(1, 2), 0),
      graft.model.Span("link", "", "/p5", 1)))
    val fus = wrapped.followUps(doc, Map.empty)
    assert(fus.map(_.priority) ==
      Seq(prio(site.hostName(1)), prio(site.hostName(0))))

    // a prioritized crawl under budget contention fetches the SAME set —
    // priority reorders politeness slots, never admission correctness
    val engine2 = new WaveEngine(spark, site,
      Map("follow_links" -> wrapped),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("rankcrawl2"),
        hostBuckets = 8, fetchPartitions = 2, maxPerHostPerWave = 1))
    engine2.run(seeds)
    import org.apache.spark.sql.functions.col
    def canonSet(e: WaveEngine) =
      e.fetchedTable().select(col("canonical").as[String]).collect().toSet
    assert(canonSet(engine2) == canonSet(engine))
    g.unpersist()
  }

  test("anchorSummary: top-k by (count desc, term asc), distinct-source in-links") {
    val anchors = Seq(
      // dst 100: term "news" ×3 (two srcs), "home" ×2, "misc" ×1 → top2 = news,home
      (1L, 100L, "news"), (1L, 100L, "news"), (2L, 100L, "news"),
      (2L, 100L, "home"), (3L, 100L, "home"), (3L, 100L, "misc"),
      // dst 200: tie between "a" and "b" → term asc breaks it
      (1L, 200L, "b"), (2L, 200L, "a"))
      .toDF("src", "dst", "term")
    val got = Graph.anchorSummary(anchors, "src", "dst", "term", k = 2)
      .orderBy("dst")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((100L, 3L, "news,home"), (200L, 2L, "a,b")))
  }
}
