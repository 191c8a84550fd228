package graft.debug

import graft.SparkTestSession
import graft.engine._
import graft.fetch.SyntheticSite
import org.apache.spark.sql.functions._

object CacheDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val site = SyntheticSite(nHosts = 2, basePagesPerHost = 4, branching = 2, hotFactor = 1)
    val seeds = (0 until 2).map(k => SeedSpec(site.pageUrl(k, 0)))
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
    val ckpt1 = SparkTestSession.tmpDir("nocache")
    val e1 = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = ckpt1, hostBuckets = 4, fetchPartitions = 2))
    e1.run(seeds)
    val fresh = SparkTestSession.tmpDir("freshcache")
    e1.fetchedTable().withColumn("fetched_at_ms", lit(System.currentTimeMillis()))
      .write.mode("overwrite").parquet(s"$fresh/wave_all")
    println("CACHE TABLE:")
    val schema = org.apache.spark.sql.Encoders.product[graft.model.FetchResult].schema
    val raw = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(fresh)
    raw.select($"url_hash", $"status", $"fetched_at_ms").show(5, false)
    val cutoff = System.currentTimeMillis() - 600 * 1000L
    println("cutoff=" + cutoff + " rows pass=" +
      raw.filter($"fetched_at_ms" >= cutoff && $"status" >= 200 && $"status" < 300).count())
    val ckpt2 = SparkTestSession.tmpDir("withcache")
    val e2 = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = ckpt2, hostBuckets = 4, fetchPartitions = 2,
        fetchCacheDir = Some(fresh), cacheTtlSec = 600))
    val res2 = e2.run(seeds)
    println("E2 fetched=" + res2.fetched)
    e2.fetchedTable().groupBy($"from_cache").count().show()
    spark.stop()
  }
}
