package graft.debug
import graft.engine._
import graft.fetch.SyntheticSite

/** Scratch driver for engine debugging (not a test). */
object DebugCrawl {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val site = SyntheticSite(nHosts = 3, basePagesPerHost = 4, branching = 2, hotFactor = 2)
    val seeds = (0 until 3).map(k => SeedSpec(site.pageUrl(k, 0)))
    val ckpt = java.nio.file.Files.createTempDirectory("dbg").toString
    val cfg = CrawlConfig(checkpointDir = ckpt, referenceOrder = true, hostBuckets = 8,
      fetchPartitions = 2, maxWaves = 25)
    val engine = new WaveEngine(spark, site, Map("follow_links" -> FollowAllLinks), cfg)
    val res = engine.run(seeds)
    println(s"RESULT waves=${res.waves} fetched=${res.fetched} deduped=${res.deduped} seen=${res.seen}")
    import spark.implicits._
    engine.fetchedTable().orderBy($"wave").select($"wave", $"canonical").as[(Int, String)].collect()
      .foreach(p => println(s"FETCH ${p._1} ${p._2}"))
    spark.stop()
  }
}
