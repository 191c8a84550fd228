package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RecrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sched(rows: Seq[(String, Int, Long)],
      minI: Int = 1, maxI: Int = 64) =
    Recrawl.schedule(rows.toDF("url", "wave", "h"), "url", "wave", "h", minI, maxI)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("schedule: doubling on unchanged, reset on change, hand-computed") {
    val got = sched(Seq(
      // a: change at obs 4 of 5 → streak 1, interval 2
      ("a", 0, 1L), ("a", 1, 1L), ("a", 2, 1L), ("a", 3, 2L), ("a", 4, 2L),
      // b: never changes over waves 0,5,9 → streak 2, interval 4, due 13
      ("b", 0, 7L), ("b", 5, 7L), ("b", 9, 7L),
      // c: changes every observation → streak 0, interval 1
      ("c", 0, 1L), ("c", 1, 2L), ("c", 2, 3L),
      // d: single observation → streak 0, interval 1
      ("d", 3, 9L)))
    assert(got("a") == ((5L, 1L, 1L, 2L, 6L)))
    assert(got("b") == ((3L, 0L, 2L, 4L, 13L)))
    assert(got("c") == ((3L, 2L, 0L, 1L, 3L)))
    assert(got("d") == ((1L, 0L, 0L, 1L, 4L)))
  }

  test("schedule: interval clamps at maxInterval") {
    val obs = (0 until 10).map(w => ("u", w, 42L))
    val got = sched(obs, minI = 1, maxI = 16)
    assert(got("u") == ((10L, 0L, 9L, 16L, 25L)))
    // and respects minInterval scaling
    val got2 = sched(Seq(("v", 0, 1L), ("v", 1, 2L)), minI = 3, maxI = 24)
    assert(got2("v") == ((2L, 1L, 0L, 3L, 4L))) // streak 0 → interval = minI
  }

  test("observationsFromFetched: one content-hashed row per fetched page, schedulable") {
    import graft.engine._
    import graft.fetch.SyntheticSite
    val site = SyntheticSite(nHosts = 2, basePagesPerHost = 3, branching = 2, hotFactor = 2)
    val engine = new WaveEngine(spark, site,
      Map("follow_links" -> FollowAllLinks),
      CrawlConfig(checkpointDir = graft.SparkTestSession.tmpDir("recrawlobs"),
        hostBuckets = 4, fetchPartitions = 2))
    engine.run((0 until 2).map(k => SeedSpec(site.pageUrl(k, 0))))
    val obs = Recrawl.observationsFromFetched(engine.fetchedTable())
    val n = engine.fetchedTable().count()
    assert(obs.count() == n) // every page observed exactly once this run
    assert(obs.select("url").distinct().count() == n)
    // a single-run history schedules every URL at minInterval after its wave
    val s = Recrawl.schedule(obs, "url", "wave", "h")
    import org.apache.spark.sql.functions.col
    assert(s.count() == n)
    assert(s.filter(col("n_obs") =!= 1).count() == 0)
    assert(s.filter(col("interval") =!= 1).count() == 0)
    // identical content on a re-observation hashes identically: replaying
    // the same fetched table as wave+1 yields zero changes, doubled interval
    val again = obs.union(obs.withColumn("wave", col("wave") + 100))
    val s2 = Recrawl.schedule(again, "url", "wave", "h")
    assert(s2.filter(col("n_changes") =!= 0).count() == 0)
    assert(s2.filter(col("interval") =!= 2).count() == 0)
  }

  test("due: admission filter on next_due_wave") {
    val df = Recrawl.schedule(Seq(
      ("x", 0, 1L), ("x", 1, 1L), // due at 1 + 2 = 3
      ("y", 0, 1L), ("y", 1, 2L)  // due at 1 + 1 = 2
    ).toDF("url", "wave", "h"), "url", "wave", "h")
    assert(Recrawl.due(df, 2).as[String].collect().toSet == Set("y"))
    assert(Recrawl.due(df, 3).as[String].collect().toSet == Set("x", "y"))
  }

  test("staleByLastmod: modified vs unseen vs no-signal vs fresh, hand-computed") {
    val entries = Seq(
      ("mod", Some(1000L)),   // seen at 900 < lastmod → modified
      ("fresh", Some(1000L)), // seen at 1100 > lastmod → not stale
      ("nosig", None),        // seen, host said nothing → not stale here
      ("new", Some(500L)),    // never seen → unseen
      ("newq", None)          // never seen, no lastmod → still unseen
    ).toDF("url", "lastmod_ms")
    val obs = Seq(
      ("mod", 800L), ("mod", 900L), // max wins
      ("fresh", 1100L), ("nosig", 5L)
    ).toDF("url", "stored_at_ms")
    val got = Recrawl.staleByLastmod(entries, obs)
      .as[(String, Option[Long], Option[Long], String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got == Map(
      "mod" -> ((Some(900L), "modified")),
      "new" -> ((None, "unseen")),
      "newq" -> ((None, "unseen"))))
  }

  test("e2e recrawl feedback: crawl → schedule across a refresh → only the changed subset is due and re-fetched") {
    import graft.engine._
    import graft.fetch.{SyntheticSite, VersionedSite}
    import org.apache.spark.sql.functions.col
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
    val e1 = crawl(1, (0 until 2).map(k => SeedSpec(inner.pageUrl(k, 0))), "rc1")
    val obs1 = Recrawl.observationsFromFetched(e1.fetchedTable()).cache()
    val allUrls = obs1.select($"url".as[String]).collect().toSeq.sorted
    assert(allUrls.size.toLong == inner.totalPages)
    val w1 = obs1.agg(org.apache.spark.sql.functions.max("wave")).head.getInt(0)

    // full refresh on version 2, relabeled onto the shared wave axis
    val e2 = crawl(2, allUrls.map(u => SeedSpec(u, parseFn = "follow_links")), "rc2", NoFollow)
    val obs2 = Recrawl.observationsFromFetched(e2.fetchedTable())
      .withColumn("wave", col("wave") + w1 + 1)
    val sched = Recrawl.schedule(obs1.union(obs2), "url", "wave", "h").cache()

    // changing pages reset to min interval, stable pages doubled
    val changed = sched.filter(col("n_changes") === 1)
      .select($"url".as[String]).collect().toSet
    val expectChanged = (0 until 2).flatMap(k =>
      (0 until inner.pagesOf(k)).collect {
        case i if VersionedSite(inner, 1).changes(k, i) => inner.pageUrl(k, i)
      }).toSet
    assert(changed == expectChanged)
    assert(sched.filter(col("n_changes") === 1 && col("interval") =!= 1).count() == 0)
    assert(sched.filter(col("n_changes") === 0 && col("interval") =!= 2).count() == 0)

    // at the first epoch after the refresh wave, exactly the fast-moving
    // subset is due — the refresh crawl re-fetches ONLY those
    val refreshWave = obs2.agg(org.apache.spark.sql.functions.max("wave")).head.getInt(0)
    val due = Recrawl.due(sched, refreshWave + 1).as[String].collect().toSet
    assert(due == expectChanged)
    val e3 = crawl(3, due.toSeq.sorted.map(u => SeedSpec(u)), "rc3", NoFollow)
    val got3 = e3.fetchedTable().select($"canonical".as[String]).collect().toSet
    assert(got3 == expectChanged) // stable pages cost no fetch this epoch
    obs1.unpersist(); sched.unpersist()
  }
}
