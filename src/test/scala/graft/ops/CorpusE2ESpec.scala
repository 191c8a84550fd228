package graft.ops

import graft.SparkTestSession
import graft.engine.{CrawlConfig, FollowAllLinks, PageParser, SeedSpec, WaveEngine}
import graft.fetch.SyntheticSite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The training-corpus end-to-end slice: a real WaveEngine crawl of the
 * synthetic site, its fetched span documents flattened into the
 * (doc_id, text) corpus shape, then the curation library run over it in
 * its canonical order — NFKC normalization → five-stage curation
 * (dedup/gates/scrub/sample) → sequence-packing layout — with each
 * stage's invariant asserted against independently computed truth.
 * A mirror host re-serving every page byte-identically simulates the
 * mirrored-content shape exact dedup exists for.
 */
class CorpusE2ESpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("crawl → documents → normalize → curate → pack") {
    val site = SyntheticSite(nHosts = 3, basePagesPerHost = 12, branching = 2, hotFactor = 2)
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("corpus-e2e"),
        hostBuckets = 4, fetchPartitions = 2))
    val res = engine.run((0 until 3).map(k => SeedSpec(site.pageUrl(k, 0))))
    assert(res.fetched == site.totalPages)

    // fetched spans -> the (doc_id, text) corpus shape of the ops plane
    val crawled = engine.fetchedTable()
      .filter(col("status") === 200)
      .select(col("canonical").as("doc_id"),
        array_join(transform(col("spans"), s => s.getField("text")), "\n").as("text"))
    // a mirror host serving every page byte-identically ("mirror:" sorts
    // AFTER "https:", so originals must win first-wins dedup)
    val docs = crawled.unionByName(
      crawled.withColumn("doc_id", concat(lit("mirror:"), col("doc_id"))))
      .withColumn("text", graft.functions.NormalizeFns.nfkc(col("text")))
      .cache()

    val curated = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minTokens = 1, minUniqRatio = 0.0, maxDupLineFrac = 1.0))
      .cache()

    // dedup invariant: one survivor per distinct content, never a mirror
    val distinctTexts = docs.select("text").distinct().count()
    assert(curated.count() == distinctTexts)
    assert(curated.filter(col("doc_id").startsWith("mirror:")).count() == 0)
    // the synthetic corpus carries no PII: scrub must be a no-op
    assert(curated.agg(sum(col("n_email") + col("n_ipv4") + col("n_phone")))
      .head().getLong(0) == 0L)

    // packing invariant: gapless intervals over the curated corpus, total
    // tokens preserved (scrubbing PII-free text keeps every token)
    val packed = Packing.layout(curated, "doc_id", "scrubbed", seqLen = 64L, nParts = 4)
    val rows = packed.orderBy("doc_id").collect()
    var expect = 0L
    for (r <- rows) {
      assert(r.getAs[Long]("start_tok") == expect, r.getAs[String]("doc_id"))
      expect = r.getAs[Long]("end_tok")
    }
    assert(expect == curated.agg(sum("n_tokens")).head().getLong(0))

    // day-2 recrawl: the incremental gate admits the full corpus once and
    // nothing on a re-offer
    val idx = SparkTestSession.tmpDir("corpus-e2e-idx")
    val day1 = Dedup.dedupIncremental(spark, docs, "doc_id", "text", idx)
    assert(day1.count() == distinctTexts)
    val day2 = Dedup.dedupIncremental(spark, docs, "doc_id", "text", idx)
    assert(day2.count() == 0)

    docs.unpersist(); curated.unpersist()
  }
}
