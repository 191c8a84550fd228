package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10 good docs (distinct, 12 varied tokens each), plus targeted rejects
  private def goodText(i: Int) =
    (0 until 12).map(k => s"w${i}_$k").mkString(" ")
  private def corpus = (
    (1 to 10).map(i => (i.toLong, goodText(i))) ++ Seq(
      (21L, goodText(1)),                       // exact dup of doc 1 (loses: 21 > 1)
      (22L, "too short"),                       // fails minTokens
      (23L, Array.fill(15)("same").mkString(" ")), // fails uniq ratio
      // 24 tokens (>=10), uniq ratio 12/24 = 0.5 (>=0.5), but 8 lines of
      // which only 4 distinct -> dup_line_frac 0.5 > 0.3: the repetition
      // gate alone rejects it
      (24L, (Seq.fill(5)("a b c") ++ Seq("d e f", "g h i", "j k l")).mkString("\n"))
    )).toDF("doc_id", "text")

  test("curate: dedup first-wins, gates drop short/repetitive docs, audit counts") {
    val out = Curation.curate(
      corpus, "doc_id", "text",
      Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3),
      augment = t => concat(t,
        when(col("doc_id") === 3, lit(" mail me at a@b.example.com")).otherwise("")))
    val rows = out.orderBy("doc_id").collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == (1L to 10L)) // dup + all three gate victims gone
    val d3 = rows.find(_.getAs[Long]("doc_id") == 3L).get
    assert(d3.getAs[Long]("n_email") == 1L)
    assert(d3.getAs[String]("scrubbed").contains("<EMAIL>"))
    assert(d3.getAs[String]("scrubbed").contains(goodText(3))) // body kept
    assert(rows.forall(_.getAs[Long]("n_tokens") == 12L))
    assert(rows.filter(_.getAs[Long]("doc_id") != 3L).forall(_.getAs[Long]("n_email") == 0L))
  }

  test("curate: sample stage is deterministic and subsets the curated set") {
    val all = Curation.curate(corpus, "doc_id", "text",
        Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3))
      .select("doc_id").as[Long].collect().toSet
    val half = Curation.curate(corpus, "doc_id", "text",
        Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3,
          sampleRate = 0.5))
      .select("doc_id").as[Long].collect().toSet
    val half2 = Curation.curate(corpus.repartition(7), "doc_id", "text",
        Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3,
          sampleRate = 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(all))
    assert(half == half2) // partition-invariant
  }

  test("funnel: first-failing-stage attribution, kept set == curate output") {
    val cfg = Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3)
    val v = Curation.funnel(corpus, "doc_id", "text", cfg)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    assert(v.size == corpus.count())            // one verdict per input doc
    assert(v(21L) == "dedup_loser")
    assert(v(22L) == "too_few_tokens")
    assert(v(23L) == "low_uniq_ratio")
    assert(v(24L) == "repetitive")
    assert((1L to 10L).forall(v(_) == "kept"))
    val kept = Curation.funnel(corpus, "doc_id", "text", cfg)
      .filter(col("stage") === "kept").select("doc_id").as[Long].collect().toSet
    val curated = Curation.curate(corpus, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == curated)
  }

  test("funnel: sampled_out stage mirrors the sample gate; report sums to input") {
    val cfg = Curation.Config(minTokens = 10, minUniqRatio = 0.5,
      maxDupLineFrac = 0.3, sampleRate = 0.5)
    val verdicts = Curation.funnel(corpus, "doc_id", "text", cfg)
    val kept = verdicts.filter(col("stage") === "kept")
      .select("doc_id").as[Long].collect().toSet
    val curated = Curation.curate(corpus, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == curated)                     // sampler attribution exact
    val sampledOut = verdicts.filter(col("stage") === "sampled_out")
      .select("doc_id").as[Long].collect().toSet
    assert((kept ++ sampledOut) == (1L to 10L).toSet) // gates unchanged by sampling
    val report = Curation.funnelReport(verdicts)
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(report.values.sum == corpus.count())
    assert(report.keySet.subsetOf(Curation.FunnelStages.toSet))
  }

  test("funnel: null-text docs keep their ledger row under a null-propagating hash") {
    // polyHash(null) is null — the q99 configuration; a plain equi-join
    // on the hash would silently drop these rows from the ledger, and a
    // null token count must attribute to the token gate (curate's filter
    // drops a null predicate), never to 'kept'
    val withNulls = corpus.unionByName(
      Seq((30L, null: String), (31L, null: String)).toDF("doc_id", "text"))
    val cfg = Curation.Config(minTokens = 10, minUniqRatio = 0.5, maxDupLineFrac = 0.3)
    val v = Curation.funnel(withNulls, "doc_id", "text", cfg,
        contentHash = c => graft.functions.HashFns.polyHash(c),
        sampleHash = c => graft.functions.HashFns.polyHash(c))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("stage")).toMap
    assert(v.size == withNulls.count())          // ledger contract holds
    assert(v(31L) == "dedup_loser")              // null-hash group, min id 30 wins
    assert(v(30L) == "too_few_tokens")           // null token count -> token gate
    assert((1L to 10L).forall(v(_) == "kept"))   // real docs unaffected
  }
}
