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
 * (dedup/gates/scrub/sample) → sequence-packing layout → CCNet
 * perplexity gate → split + cross-split leakage purge →
 * temperature-flattened mix → BPE tokenization — with each stage's
 * invariant asserted against independently computed truth.
 * A mirror host re-serving every page byte-identically simulates the
 * mirrored-content shape exact dedup exists for.
 */
class CorpusE2ESpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("crawl → documents → normalize → curate → pack → perplexity gate → split guard → temperature mix → BPE") {
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

    // ---- day-3 training prep over the curated survivors:
    // perplexity gate → split + leakage purge → temperature mix → BPE ----

    // CCNet-style gate, LM self-trained on the curated corpus: every
    // multi-token doc scores (all its transitions were seen), short docs
    // are unscorable and dropped by the gate's default
    val nB = 512
    val scorable = curated
      .filter(size(split(trim(col("scrubbed")), "\\s+")) >= 2).count()
    val scored = Perplexity.scoreNll(
      Perplexity.bigramFeatures(curated, "doc_id", "scrubbed", nB),
      Perplexity.bigramModel(
        Perplexity.bigramFeatures(curated, "doc_id", "scrubbed", nB)), nB)
    assert(scored.count() == scorable)
    val thr = scored.stat.approxQuantile("nll", Array(2.0 / 3), 0.0)(0)
    val gated = Perplexity.perplexityGate(curated, curated, "doc_id",
      "scrubbed", maxNll = thr, nBuckets = nB).cache()
    val nGated = gated.count()
    assert(nGated >= scorable * 2 / 3 && nGated < curated.count())

    // split with the cross-split LSH leakage guard: eval is untouched and
    // re-mining the survivors finds nothing (the fixpoint the guard sells)
    val fr = Seq("train" -> 0.8, "eval" -> 0.2)
    val guarded = Splits.splitWithLeakageGuard(gated, "doc_id", "scrubbed",
      fr, "train").cache()
    val train2 = guarded.filter(col("split") === "train")
    val eval2 = guarded.filter(col("split") =!= "train")
    assert(eval2.count() ==
      Splits.assignSplit(gated, "doc_id", fr)
        .filter(col("split") =!= "train").count())
    assert(Splits.crossSplitLeakPairs(train2, eval2, "doc_id", "scrubbed")
      .count() == 0L)

    // temperature-flatten the training mix by host: per-host survivor
    // counts must equal the quota plane exactly
    val byHost = train2.withColumn("host",
      regexp_extract(col("doc_id"), "://([^/]+)", 1))
    val quotas = Temperature.quotas(byHost, "host", 0.5, 20)
      .select($"host".as[String], $"quota".as[Long]).collect().toMap
    val mixed = Temperature.resample(byHost, "host", xxhash64(col("doc_id")),
      col("doc_id"), alpha = 0.5, totalDocs = 20)
    val mixCounts = mixed.groupBy("host").count()
      .select($"host".as[String], $"count".as[Long]).collect().toMap
    assert(mixCounts == quotas.filter(_._2 > 0))

    // BPE-tokenize the mix with a tokenizer trained on the train split:
    // every word yields ≥1 subword, and subwords never outnumber the
    // word's non-whitespace characters
    val counts = Bpe.tokenCounts(train2, mixed, "doc_id", "scrubbed", 8)
    val bounds = mixed.select(col("doc_id"),
        size(split(trim(col("scrubbed")), "\\s+")).cast("long").as("n_words"),
        length(regexp_replace(col("scrubbed"), "\\s", "")).cast("long").as("n_chars"))
      .join(counts, mixed("doc_id") === counts("id"))
    assert(bounds.count() == mixed.count())
    assert(bounds.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_chars")).count() == 0L)

    docs.unpersist(); curated.unpersist(); gated.unpersist(); guarded.unpersist()
  }

  test("day-4: funnel observability, corpus drift, budgeted assembly, span-diff regression gate") {
    val site = SyntheticSite(nHosts = 3, basePagesPerHost = 8, branching = 2, hotFactor = 2)
    val parsers: Map[String, PageParser] = Map("follow_links" -> FollowAllLinks)
    val engine = new WaveEngine(spark, site, parsers,
      CrawlConfig(checkpointDir = SparkTestSession.tmpDir("corpus-e2e-d4"),
        hostBuckets = 4, fetchPartitions = 2))
    engine.run((0 until 3).map(k => SeedSpec(site.pageUrl(k, 0))))
    val fetched = engine.fetchedTable().filter(col("status") === 200).cache()
    val crawled = fetched
      .select(col("canonical").as("doc_id"),
        array_join(transform(col("spans"), s => s.getField("text")), "\n").as("text"))
    val docs = crawled.unionByName(
      crawled.withColumn("doc_id", concat(lit("mirror:"), col("doc_id")))).cache()
    val cfg = Curation.Config(minTokens = 1, minUniqRatio = 0.0, maxDupLineFrac = 1.0)

    // funnel observability: ledger covers every input doc, kept set IS
    // the curate output, and every mirror doc is attributed to dedup
    val verdicts = Curation.funnel(docs, "doc_id", "text", cfg).cache()
    assert(verdicts.count() == docs.count())
    val kept = verdicts.filter(col("stage") === "kept")
      .select("doc_id").as[String].collect().toSet
    val curated = Curation.curate(docs, "doc_id", "text", cfg).cache()
    assert(kept == curated.select("doc_id").as[String].collect().toSet)
    assert(verdicts.filter(col("doc_id").startsWith("mirror:"))
      .filter(col("stage") =!= "dedup_loser").count() == 0)
    val report = Curation.funnelReport(verdicts)
      .select($"stage".as[String], $"n_docs".as[Long]).collect().toMap
    assert(report.values.sum == docs.count())

    // corpus drift raw -> curated: the mirror stratum vanishes entirely
    // (mirroring is uniform per host, so host shares alone wouldn't move
    // — the stratum choice is what makes the drift visible)
    val host = (c: org.apache.spark.sql.Column) =>
      regexp_extract(c, "://([^/]+)", 1)
    val stratum = (c: org.apache.spark.sql.Column) =>
      when(c.startsWith("mirror:"), lit("mirror")).otherwise(host(c))
    val drift = Mix.drift(
      docs.withColumn("h", stratum(col("doc_id"))).withColumn("scrubbed", col("text")),
      curated.withColumn("h", stratum(col("doc_id"))),
      "h", "scrubbed")
    val tv = drift.agg(sum("tv_contrib")).head().getDouble(0)
    assert(tv > 0.0)
    val mirrorRow = drift.filter(col("h") === "mirror").collect()
    assert(mirrorRow.length == 1 && mirrorRow.head.getAs[Long]("n_docs_curr") == 0L)

    // budgeted assembly: score by doc length (long docs first), budget =
    // half the curated tokens; the ledger partitions exactly at the budget
    val scored = curated.withColumn("score", col("n_tokens"))
    val budget = curated.agg(sum("n_tokens")).head().getLong(0) / 2
    val ledger = Budget.selectByBudget(scored, "doc_id", "score", "scrubbed", budget)
      .collect()
    assert(ledger.filter(_.getAs[Boolean]("kept"))
      .forall(_.getAs[Long]("cum_tokens") <= budget))
    assert(ledger.filterNot(_.getAs[Boolean]("kept"))
      .forall(_.getAs[Long]("cum_tokens") > budget))
    assert(ledger.exists(_.getAs[Boolean]("kept")) &&
      ledger.exists(!_.getAs[Boolean]("kept")))

    // span-diff regression gate: the crawl vs itself matches everywhere;
    // a re-extraction that drops one doc and edits one span is caught
    val left = fetched.select(col("canonical").as("doc_id"), col("spans"))
    val self = SpanDiff.auditReport(SpanDiff.audit(left, left, "doc_id"))
      .select($"verdict".as[String], $"n_docs".as[Long]).collect().toMap
    assert(self.keySet == Set("match"))
    val victim = left.orderBy("doc_id").select("doc_id").as[String].head()
    val right = left.filter(col("doc_id") =!= victim)
      .withColumn("spans", transform(col("spans"), s =>
        struct(s.getField("kind").as("kind"),
          when(col("doc_id").endsWith("/p1") && s.getField("offset") === 0,
            lit("EDITED")).otherwise(s.getField("text")).as("text"),
          s.getField("media_ref").as("media_ref"),
          s.getField("offset").as("offset"))))
    val audit = SpanDiff.audit(left, right, "doc_id").cache()
    assert(audit.filter(col("verdict") === "left_only")
      .select("doc_id").as[String].collect().toSeq == Seq(victim))
    assert(audit.filter(col("verdict") === "mismatch")
      .count() == audit.filter(col("doc_id").endsWith("/p1") &&
        col("doc_id") =!= victim).count())

    fetched.unpersist(); docs.unpersist(); verdicts.unpersist()
    curated.unpersist(); audit.unpersist()
  }
}
