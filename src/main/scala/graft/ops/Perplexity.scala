package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFns

/**
 * CCNet-style language-model perplexity quality filter (Wenzek et al.
 * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
 * Crawl Data", arXiv:1911.00359). CCNet scores every crawled document
 * under an LM trained on a trusted corpus (Wikipedia) and keeps the
 * low-perplexity head/middle tertiles — the standard quality gate
 * between dedup and training in web-scale pipelines. CCNet's LM is a
 * KenLM 5-gram; this engine substitutes a hashed bucket-bigram LM with
 * Laplace smoothing — deterministic, engine-portable (the DuckDB oracle
 * recomputes the whole pipeline), and linear — with the same selection
 * semantics: per-document mean negative log-likelihood, thresholded.
 *
 * Scale shape (everything is one pass + fixed-width aggregates):
 *  - [[bigramFeatures]]: per-token hashing is one native loop inside the
 *    scan ([[graft.functions.HashFns.polyShingleHashesAll]] at n=1 —
 *    text never leaves the scan); adjacent-pair bucketing is a zip of
 *    two array slices; then ONE map-side-combinable groupBy over
 *    (id, pb, cb) fixed-width rows.
 *  - [[bigramModel]]: an O(min(corpus bigrams, nBuckets²)) count plane —
 *    a data-independent ceiling (~16M fixed-width rows at the default
 *    nBuckets=4096, usually far fewer). The context plane derived from
 *    it is O(nBuckets) and explicitly broadcast.
 *  - [[scoreNll]]: features ⋈ model on (pb, cb) — equi-join, broadcast
 *    vs shuffle left to AQE (the plane's ceiling is a config constant,
 *    not data-scale) — then one groupBy(id) whose per-document sum folds
 *    in ASCENDING (pb, cb) ORDER (collect → sort → fold), so the double
 *    is partition-count-invariant and bit-identical to the oracle's
 *    ordered list_reduce.
 *  - [[labelTertiles]]: thresholds are two driver-side scalars (from
 *    `approxQuantile` or exact quantiles on the O(docs) score table);
 *    labeling itself is a row-local codegen'd CASE — the corpus never
 *    sees a global sort or an unpartitioned window.
 */
object Perplexity {

  /** Adjacent-token hashed bucket pairs with occurrence counts:
    * (id, pb, cb, cnt). `pb`/`cb` = polyHash(token) mod nBuckets for the
    * previous/current token of each bigram position. Documents shorter
    * than 2 tokens emit no rows (treat missing as unscored downstream —
    * same convention as [[Dsir.features]]). */
  def bigramFeatures(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096): DataFrame = {
    val bk = transform(
      HashFns.polyShingleHashesAll(split(trim(col(textCol)), "\\s+"), 1),
      h => pmod(h, lit(nBuckets.toLong)))
    docs
      .select(col(idCol).as("id"),
        explode(zip_with(
          slice(bk, lit(1), size(bk) - 1),
          slice(bk, lit(2), size(bk) - 1),
          (p, c) => struct(p.as("pb"), c.as("cb")))).as("bg"))
      .select(col("id"), col("bg.pb").as("pb"), col("bg.cb").as("cb"))
      .groupBy(col("pb"), col("cb"), col("id"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The trained LM: bigram count plane (pb, cb, c2) aggregated over a
    * reference-corpus feature table. Context counts c1 are derived from
    * this plane inside [[scoreNll]] (Σ_cb c2 per pb), so one table IS
    * the model — persist it with [[graft.sinks.SnapshotTable]] to score
    * many corpora against the same reference. */
  def bigramModel(refFeatures: DataFrame): DataFrame =
    refFeatures.groupBy(col("pb"), col("cb")).agg(sum(col("cnt")).as("c2"))

  /** Per-document mean negative log-likelihood (nats/token) under the
    * Laplace-smoothed bucket-bigram LM:
    *   P(cb|pb) = (c2 + α) / (c1 + α·nBuckets)
    * (an unseen context degrades to the uniform 1/nBuckets). Output:
    * (id, n_scored, nll, ppl) with ppl = exp(nll); lower = more fluent
    * under the reference corpus. */
  def scoreNll(features: DataFrame, model: DataFrame, nBuckets: Int,
      alpha: Double = 1.0): DataFrame = {
    val contexts = model.groupBy(col("pb")).agg(sum(col("c2")).as("c1"))
    features
      .join(model, Seq("pb", "cb"), "left")
      .join(broadcast(contexts), Seq("pb"), "left")
      .select(col("id"), col("pb"), col("cb"), col("cnt"),
        (col("cnt").cast("double") *
          (log(coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha * nBuckets)) -
           log(coalesce(col("c2"), lit(0L)).cast("double") + lit(alpha)))).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("cnt")).as("n_scored"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pb"), col("cb"), col("c")))),
            e => e.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("s"))
      .select(col("id"), col("n_scored"),
        (col("s") / col("n_scored")).as("nll"),
        exp(col("s") / col("n_scored")).as("ppl"))
  }

  /** CCNet's head/middle/tail split as a row-local CASE over two
    * precomputed nll thresholds (head ≤ headMax < middle ≤ middleMax <
    * tail). Compute the thresholds once driver-side — e.g.
    * `scored.stat.approxQuantile("nll", Array(1.0/3, 2.0/3), 0.001)` —
    * they are two scalars, never a per-row window. */
  def labelTertiles(scored: DataFrame, headMax: Double,
      middleMax: Double): DataFrame =
    scored.withColumn("bucket",
      when(col("nll") <= headMax, lit("head"))
        .when(col("nll") <= middleMax, lit("middle"))
        .otherwise(lit("tail")))

  /** The composed gate: train on `reference`, score `corpus`, keep
    * documents with nll ≤ maxNll (CCNet keeps head+middle; pass the
    * middle tertile's upper threshold). Unscorable docs (< 2 tokens)
    * carry no evidence either way — `keepUnscored` chooses their fate
    * (CCNet drops near-empty docs, the default). */
  def perplexityGate(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, maxNll: Double,
      nBuckets: Int = 4096, alpha: Double = 1.0,
      keepUnscored: Boolean = false): DataFrame = {
    val model = bigramModel(bigramFeatures(reference, idCol, textCol, nBuckets))
    val scored = scoreNll(bigramFeatures(corpus, idCol, textCol, nBuckets),
      model, nBuckets, alpha)
    val keep = scored.filter(col("nll") <= maxNll)
      .select(col("id").as("__ppl_keep_id"))
    val joined = corpus.join(keep,
      corpus(idCol) === keep("__ppl_keep_id"),
      if (keepUnscored) "left_outer" else "inner")
    val gated =
      if (keepUnscored)
        joined.filter(col("__ppl_keep_id").isNotNull ||
          size(split(trim(col(textCol)), "\\s+")) < 2)
      else joined
    gated.drop("__ppl_keep_id")
  }
}
